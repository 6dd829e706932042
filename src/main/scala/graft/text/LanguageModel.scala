package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model scoring for perplexity-based quality
  * filtering — the CCNet/Gopher-style curation stage: train a small LM
  * on the corpus (or a trusted slice), score every document by its
  * negative log-likelihood, and filter/bucket on the score. Documents a
  * bigram LM finds surprising are disproportionately boilerplate,
  * gibberish, or out-of-distribution — the standard cheap proxy before
  * any neural quality model.
  *
  * Model: add-1-smoothed bigram LM over whitespace tokens.
  *   P(w₁)      = (C(w₁)+1) / (N+V)        (unigram start term)
  *   P(b | a)   = (C(a,b)+1) / (C(a)+V)    (bigram chain terms)
  * where C are corpus counts, N total tokens, V distinct tokens.
  *
  * Graded surface is EXACT-INTEGER by the q203 (DSIR) discipline: each
  * per-term negative log λ = round(ln(den),6) − round(ln(num),6) is a
  * DECIMAL(18,6) difference of 6dp-rounded logs of EXACT integer
  * inputs (num ≤ den, so λ ≥ 0 always), the per-document sum Σ mult·λ
  * carries exactly 6dp, and ×10⁶ makes it an exact BIGINT — no
  * decimal→double cast anywhere near the graded columns, identical on
  * both engines.
  *
  * Scale posture (100 TB): the corpus is tokenized twice — once for the
  * count tables (two hash aggs: unigram- and bigram-keyed; both
  * vocabulary-shaped, not corpus-shaped), once for scoring (per-doc
  * bigram multiplicities are a hash agg, then ONE equi-join against
  * each count table on its key, then the per-doc sum). N and V are a
  * [[graft.ops.Scalar]]-class single-row aggregate. No window over data
  * rows, no self-join, no driver loop.
  *
  * Reference anchor: the reference pipeline keeps every cleaned row
  * (`etl-ml.py`) — LM-based filtering is part of the LLM-curation
  * surface built beyond it.
  */
object LanguageModel {

  /** Per-document bigram negative log-likelihood in exact micro-nats.
    * Output: (doc_id, n_tok, nll_micro, nll_per_tok_micro) — all
    * BIGINT; `nll_per_tok_micro` is the length-normalized filter score
    * (floor division of positive operands, engine-portable). */
  def bigramNll(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
      filter(TextOps.tokens(col("text")), t => length(t) > 0).as("w"))
      .filter(size(col("w")) >= 1)
    val uniStream = toks.select(col("doc_id"), explode(col("w")).as("a"))
    val cu = uniStream.groupBy(col("a")).agg(count(lit(1)).as("ca"))
      .localCheckpoint() // vocabulary-sized; totals + both joins reuse it
    val nv = cu.agg(sum(col("ca")).as("n"), count(lit(1)).as("v")).first()
    val bigNV = nv.getLong(0) + nv.getLong(1) // N + V, exact long
    val vocab = nv.getLong(1)
    // bigram pair stream: adjacent positions from the filtered token
    // array — a narrow projection (the BPE.pairCounts shape), exploded
    // with per-doc multiplicity
    val biStream = toks
      .filter(size(col("w")) >= 2) // sequence(0, -1) would run DESCENDING
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - 2),
          i => struct(element_at(col("w"), i + 1).as("a"),
            element_at(col("w"), i + 2).as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    // per-doc bigram multiplicities, materialized ONCE: both the corpus
    // count table (cab = Σ mult, the exact same integer as counting the
    // raw stream) and the scoring chain terms read it — without the
    // checkpoint the corpus-sized tokenize+explode stream is evaluated
    // AND shuffled twice (once keyed (a,b), once keyed (doc_id,a,b));
    // with it the full stream crosses the exchange once and the (a,b)
    // count aggregates the much smaller per-doc-distinct table
    val mult = biStream.groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("mult"))
      .localCheckpoint()
    val cab = mult.groupBy(col("a"), col("b"))
      .agg(sum(col("mult")).as("cab"))
    // per-term λ at exactly 6dp (λ ≥ 0: numerator count+1 ≤ denominator)
    val lamUni = cu.select(col("a").as("word"),
      (round(log(lit(bigNV.toDouble)), 6).cast("decimal(18,6)") -
        round(log((col("ca") + lit(1L)).cast("double")), 6)
          .cast("decimal(18,6)")).as("lam"))
    val lamBi = cab.join(cu.withColumnRenamed("a", "ua"),
        col("a") === col("ua"))
      .select(col("a"), col("b"),
        (round(log((col("ca") + lit(vocab)).cast("double")), 6)
            .cast("decimal(18,6)") -
          round(log((col("cab") + lit(1L)).cast("double")), 6)
            .cast("decimal(18,6)")).as("lam"))
    // score: the start term joins each doc's FIRST token to the unigram
    // λ table; chain terms join per-doc bigram multiplicities to the
    // bigram λ table on its natural key
    val startTerm = toks
      .select(col("doc_id"), element_at(col("w"), 1).as("word"),
        size(col("w")).cast("long").as("n_tok"))
      .join(lamUni, "word")
      .select(col("doc_id"), col("n_tok"), col("lam").as("lam0"))
    val chainTerms = mult
      .join(lamBi, Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("mult") * col("lam")).as("lamSum"))
    startTerm.join(chainTerms, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        // λ carries exactly 6dp, so the ×10⁶ sum is an exact integer —
        // graded as BIGINT micro-nats (the q203 discipline); single-token
        // docs have no chain terms, hence the coalesce
        ((col("lam0") + coalesce(col("lamSum"), lit(0).cast("decimal(18,6)")))
          * lit(1000000L)).cast("long").as("nll_micro"))
      .withColumn("nll_per_tok_micro", expr("nll_micro div n_tok"))
      .orderBy(col("doc_id"))
  }

  /** [[bigramNll]] in the PRODUCTION configuration: the LM trains on a
    * TRUSTED SLICE (`train`) and scores a different corpus — the CCNet
    * shape ("train on Wikipedia, score the crawl"). Out-of-vocabulary
    * tokens and unseen bigrams take count 0 under the same add-1
    * smoothing (every probability stays defined), which is what makes
    * the score a DOMAIN distance: text far from the training slice
    * pays the OOV floor ln(N+V) / ln(C(a)+V) per term.
    *
    * Same exact-integer grading as [[bigramNll]]. Scale posture is
    * BETTER than the self-trained form: both count tables are
    * slice-sized, so with a bounded trusted slice the λ sides broadcast
    * and the score side stays one tokenize + two equi-joins + one
    * per-doc agg over the big corpus. */
  def bigramNllFrom(train: DataFrame, docs: DataFrame): DataFrame = {
    val trainToks = train.select(
      filter(TextOps.tokens(col("text")), t => length(t) > 0).as("w"))
      .filter(size(col("w")) >= 1)
    val cu = trainToks.select(explode(col("w")).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("ca"))
      .localCheckpoint()
    val nv = cu.agg(sum(col("ca")).as("n"), count(lit(1)).as("v")).first()
    val bigNV = nv.getLong(0) + nv.getLong(1)
    val vocab = nv.getLong(1)
    val cab = trainToks
      .filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => struct(element_at(col("w"), i + 1).as("a"),
          element_at(col("w"), i + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cab"))
    // scored corpus token/bigram streams
    val toks = docs.select(col("doc_id"),
      filter(TextOps.tokens(col("text")), t => length(t) > 0).as("w"))
      .filter(size(col("w")) >= 1)
    val biStream = toks
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - 2),
          i => struct(element_at(col("w"), i + 1).as("a"),
            element_at(col("w"), i + 2).as("b")))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    // OOV-aware terms: LEFT joins against the slice counts, count 0
    // when absent — λ computed AT SCORE TIME from the coalesced counts
    // under the identical 6dp decimal discipline
    val startTerm = toks
      .select(col("doc_id"), element_at(col("w"), 1).as("word"),
        size(col("w")).cast("long").as("n_tok"))
      .join(cu.withColumnRenamed("a", "word"), Seq("word"), "left")
      .select(col("doc_id"), col("n_tok"),
        (round(log(lit(bigNV.toDouble)), 6).cast("decimal(18,6)") -
          round(log((coalesce(col("ca"), lit(0L)) + lit(1L)).cast("double")), 6)
            .cast("decimal(18,6)")).as("lam0"))
    val chainTerms = biStream.groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("mult"))
      .join(cab, Seq("a", "b"), "left")
      .join(cu, Seq("a"), "left")
      .select(col("doc_id"), col("mult"),
        (round(log((coalesce(col("ca"), lit(0L)) + lit(vocab)).cast("double")), 6)
            .cast("decimal(18,6)") -
          round(log((coalesce(col("cab"), lit(0L)) + lit(1L)).cast("double")), 6)
            .cast("decimal(18,6)")).as("lam"))
      .groupBy(col("doc_id"))
      .agg(sum(col("mult") * col("lam")).as("lamSum"))
    startTerm.join(chainTerms, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        ((col("lam0") + coalesce(col("lamSum"), lit(0).cast("decimal(18,6)")))
          * lit(1000000L)).cast("long").as("nll_micro"))
      .withColumn("nll_per_tok_micro", expr("nll_micro div n_tok"))
      .orderBy(col("doc_id"))
  }
}

package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-vector similarity search over n-gram shingle TF-IDF features —
  * the lexical complement to the dense-embedding ANN family
  * ([[Similarity]], [[PQ]]): retrieval by *content overlap* (BM25-class)
  * instead of a learned embedding, the other half of every production
  * near-dup / retrieval stack.
  *
  * Plan shape (term-at-a-time, inverted index): postings are the
  * (doc, shingle) pairs; the dot product is an equi-join of postings
  * with itself on the shingle key + one hash aggregation per doc pair.
  * Only pairs sharing a feature are ever generated — candidate volume
  * is sum(df²) over shingles, never |docs|², and `maxDf` caps the
  * posting lists that dominate that sum (impact pruning: the same
  * stop-shingle hazard as [[graft.dedup.Dedup.ngramJaccardCapped]]).
  * All shuffles are keyed (shingle, then doc pair); AQE handles skew.
  *
  * Exactness discipline: tf of a distinct shingle is 1, so the weight
  * is the idf alone, carried as a scaled long (micro-units:
  * round(ln(N/df)·1e6)); pairwise products and squared norms then
  * accumulate in exact 64-bit integer arithmetic — order-insensitive
  * and portable across engines (the q77 principle, in longs instead of
  * decimals because long hash-agg codegen JITs an order of magnitude
  * cheaper). Overflow headroom: w ≤ ln(corpus)·1e6 ≈ 4e7 even at 1e12
  * docs, so each product ≤ 1.6e15 and a pair can share ~5 700 shingles
  * per long — per-PAIR shared-shingle counts are bounded by document
  * length, not corpus size, and the bound is ENFORCED at runtime: the
  * dot aggregation counts each pair's shared shingles and raises past
  * the headroom (see [[shingleTfidfTopKFrom]]) instead of silently
  * wrapping. The double steps (sqrt, final divide) are
  * IEEE-deterministic. Norms include ALL of a doc's shingles (also
  * df=1 and df>maxDf ones), so with a loose `maxDf` scores are exact
  * cosine; a tight cap only ever *under*-estimates (dot terms are
  * dropped, norms are not).
  */
object SparseSim {

  /** Postings weighted by idf in micro-units: round(ln(N/df)·1e6) as
    * long. (round(x·1e6, 0), NOT round(x, 6)·1e6 — the 6-dp double is
    * not exactly k/1e6, and truncation off the re-scaled ±ε would
    * disagree between engines.) */
  private def weighted(documents: DataFrame, n: Int): (DataFrame, DataFrame) =
    weightedFrom(graft.dedup.Dedup.shingles(documents, n).localCheckpoint(),
      graft.ops.Scalar.count(documents))

  private def weightedFrom(sh: DataFrame, nDocs: Long): (DataFrame, DataFrame) = {
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // posts feeds the norms agg AND both sides of the dot self-join —
    // materialize once or the shingle→df→join pipeline re-runs per
    // consumer (the ngramJaccard lesson; measured 20.8 s → 6.2 s at
    // sf0.1 from this checkpoint)
    val posts = sh.join(df, "shingle")
      .select(col("doc_id"), col("shingle"), col("df"),
        round(log(lit(nDocs.toDouble) / col("df")) * lit(1e6), 0)
          .cast("long").as("w"))
      .localCheckpoint()
    val norms = posts.groupBy(col("doc_id"))
      .agg(sqrt((sum(col("w") * col("w"))).cast("double") / lit(1e12)).as("norm"))
    (posts, norms)
  }

  /** Top-k most cosine-similar documents for EVERY document, over
    * n-gram shingle TF-IDF features. Returns (a_id, b_id, sim, rn),
    * rn = 1..k ordered by (sim desc, b_id) — fully deterministic.
    * Documents shorter than n tokens have no features and emit no rows. */
  def shingleTfidfTopK(documents: DataFrame, n: Int, k: Int,
                       maxDf: Long = 1000L): DataFrame =
    shingleTfidfTopKFrom(graft.dedup.Dedup.shingles(documents, n).localCheckpoint(),
      graft.ops.Scalar.count(documents), k, maxDf)

  /** [[shingleTfidfTopK]] over a pre-materialized shingle table (e.g.
    * [[graft.dedup.Dedup.shinglesCached]]) — the serve-path form.
    *
    * Overflow safety (runtime-enforced): the dot accumulates one
    * product ≤ wmax² per shared shingle, so a pair may share at most
    * Long.MaxValue / wmax² terms before the exact-long sum wraps
    * (~5 700 at web-corpus idf scale). Rather than trusting the
    * documented input bound, the aggregation counts each pair's shared
    * shingles and `raise_error`s past the headroom (halved for safety
    * margin) — the EXACT failing condition, per pair, one codegen'd
    * count + branch, zero cost unless triggered. `headroomOverride`
    * exists for tests (the natural bound is unreachable at fixture
    * scale). */
  def shingleTfidfTopKFrom(sh: DataFrame, nDocs: Long, k: Int,
                           maxDf: Long = 1000L,
                           headroomOverride: Long = 0L): DataFrame = {
    val (posts, norms) = weightedFrom(sh, nDocs)
    serveTopK(posts, norms, nDocs, k, maxDf, headroomOverride)
  }

  /** Session-scoped cache of the weighted-postings artifacts (posts is
    * localCheckpointed by [[weightedFrom]]) — the build-once/serve-many
    * split the shingle/IVF/PQ caches use. The tf-idf index is built
    * once per (session, corpus) and served by every consumer (top-k,
    * rank fusion). Same applicationId eviction hygiene as the others. */
  private val tfidfCache =
    new graft.ops.BoundedCache[String, (DataFrame, DataFrame)](maxEntries = 8)

  /** The (a_id < b_id, dot) exact-long dot-product pair table is
    * k-INDEPENDENT — q100 (k=3) and the fusion leg (k=5) rank the same
    * pairs — so it caches separately from the postings, keyed by the
    * df cap that shapes it. */
  private val dotsCache = new graft.ops.BoundedCache[(String, Long), DataFrame](
    maxEntries = 8)

  def shingleTfidfTopKCached(corpusKey: String, sh: DataFrame, nDocs: Long,
                             k: Int, maxDf: Long = 1000L): DataFrame = {
    val appId = sh.sparkSession.sparkContext.applicationId
    val (posts, norms) = tfidfCache.getOrCompute(appId, corpusKey)(
      weightedFrom(sh, nDocs))
    val dots = dotsCache.getOrCompute(appId, (corpusKey, maxDf))(
      dotPairs(posts, nDocs, maxDf, headroomOverride = 0L).localCheckpoint())
    topKFromDots(dots, norms, k)
  }

  /** Graded from-scratch rebuild of the tf-idf artifacts (weighted
    * postings + the k-independent dot-pair table) summarized per
    * 50-doc bucket — the q172/q194 build-grading discipline for THIS
    * family: Bench pre-warms [[shingleTfidfTopKCached]]'s session
    * caches so q100/q102 time serving, and the build cost stays
    * visible and attributed through the query wrapping this method.
    * The checksum sums dot % 1e9 rather than dot itself: exact-long
    * dot sums over a whole bucket could exceed BIGINT at corpus scale
    * and Spark's non-ANSI sum wraps silently while DuckDB's HUGEINT
    * doesn't — the mod keeps every term < 1e9 (dots are positive, so
    * both engines agree on %) and the sum far inside the portable
    * range while still moving if ANY pair's dot changes. */
  def buildSummary(sh: DataFrame, nDocs: Long, maxDf: Long = 1000L): DataFrame = {
    val (posts, _) = weightedFrom(sh, nDocs)
    dotPairs(posts, nDocs, maxDf, headroomOverride = 0L)
      .groupBy(expr("a_id div 50").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("dot")).as("max_dot"),
        min(col("dot")).as("min_dot"),
        sum(col("dot") % 1000000000L).as("chk"))
      .orderBy(col("bucket"))
  }

  /** Exact micro-unit dot products for every co-shingled (a < b) pair
    * with the per-pair overflow-headroom guard. */
  private def dotPairs(posts: DataFrame, nDocs: Long, maxDf: Long,
                       headroomOverride: Long): DataFrame = {
    val joinable = posts.filter(col("df") >= 2 && col("df") <= maxDf)
    // wmax = idf of the rarest joinable shingle (df = 2); ≥ 1 so the
    // division below never zeroes (at nDocs <= 2 every weight is 0)
    val wmax = math.max(math.round(math.log(nDocs.toDouble / 2.0) * 1e6), 1L)
    val headroom =
      if (headroomOverride > 0) headroomOverride
      else Long.MaxValue / (wmax * wmax) / 2
    joinable.select(col("doc_id").as("a_id"), col("shingle"), col("w").as("wa"))
      .join(joinable.select(col("doc_id").as("b_id"), col("shingle"), col("w").as("wb")),
        "shingle")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("wa") * col("wb")).as("dot"), count(lit(1)).as("n_sh"))
      .withColumn("dot", when(col("n_sh") <= lit(headroom), col("dot"))
        .otherwise(raise_error(concat(
          lit("SparseSim.shingleTfidfTopK: pair ("), col("a_id"), lit(", "), col("b_id"),
          lit(") shares "), col("n_sh"),
          lit(s" shingles, past the exact-long headroom $headroom — widen the"),
          lit(" accumulator to decimal or tighten maxDf")))))
      .drop("n_sh")
  }

  /** Cosine scoring + per-query top-k over a prebuilt dot table. The
    * ranking goes through the bounded-heap [[graft.plans.TopK]] exec
    * (window + row_number would SORT every a_id partition of the
    * mirrored pair table; the heap keeps k per key in one pass —
    * equality with the window form is ExtensionsSpec-gated). */
  private def topKFromDots(dots: DataFrame, norms: DataFrame, k: Int): DataFrame = {
    // mirror once so every doc ranks its neighbors
    val sym = dots.unionByName(dots.select(col("b_id").as("a_id"),
      col("a_id").as("b_id"), col("dot")))
    val scored = sym
      .join(norms.select(col("doc_id").as("a_id"), col("norm").as("na")), "a_id")
      .join(norms.select(col("doc_id").as("b_id"), col("norm").as("nb")), "b_id")
      .withColumn("sim",
        round((col("dot").cast("double") / lit(1e12)) / (col("na") * col("nb")), 6))
    graft.plans.TopK.topKPerKey(scored, Seq("a_id"),
        Seq(("sim", false), ("b_id", true)), k)
      .select(col("a_id"), col("b_id"), col("sim"), col("rn"))
      .orderBy(col("a_id"), col("rn"))
  }

  private def serveTopK(posts: DataFrame, norms: DataFrame, nDocs: Long, k: Int,
                        maxDf: Long, headroomOverride: Long): DataFrame =
    topKFromDots(dotPairs(posts, nDocs, maxDf, headroomOverride), norms, k)

  /** BM25 top-k retrieval, documents-as-queries, over the same distinct-
    * shingle inverted index as [[shingleTfidfTopK]]. With distinct
    * shingles tf ≡ 1, so BM25 collapses to
    * score(q→d) = (Σ_{t∈q∩d} idf(t)) · (k1+1)/(1 + k1·(1−b+b·|d|/avgdl)):
    * a symmetric shared-idf sum (idf in micro-unit longs — exact,
    * order-insensitive) times a per-DOC saturation factor, so one a<b
    * dot join serves both directions and the asymmetry (short docs rank
    * higher as targets) comes from the factor alone. idf is the BM25
    * form ln((N−df+½)/(df+½)+1) — positive for all df, unlike the raw
    * ln(N/df) at df=N. avgdl and N are Scalar-class reductions folded
    * into the plan as literals. Same candidate bound as every inverted-
    * index op here: sum over shingles of df², df capped at `maxDf`. */
  def bm25TopK(documents: DataFrame, n: Int, k: Int, maxDf: Long = 1000L,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFrom(graft.dedup.Dedup.shingles(documents, n).localCheckpoint(),
      graft.ops.Scalar.count(documents), k, maxDf, k1, b)

  /** [[bm25TopK]] over a pre-materialized shingle table — the serve-path
    * form. */
  def bm25TopKFrom(sh: DataFrame, nDocs: Long, k: Int, maxDf: Long = 1000L,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // df as a whole-partition window count: the groupBy(shingle) + join
    // back on shingle paid TWO corpus-sized exchanges of the shingle
    // table for one derived column; a count() over partitionBy(shingle)
    // attaches the identical df with ONE exchange (guide §2.4 — two
    // operations keyed the same way share one exchange). Same rows, so
    // every w is bit-identical.
    val byShingle = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
    val posts = sh
      .withColumn("df", count(lit(1)).over(byShingle))
      .select(col("doc_id"), col("shingle"), col("df"),
        round(log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * lit(1e6), 0).cast("long").as("w"))
      .localCheckpoint()
    val lens = posts.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    // Σ len == |posts| exactly, so one aggregate over the len table
    // replaces the two separate Scalar.count jobs (same two integers,
    // same division, same double)
    val nl = lens.agg(sum(col("len")).as("np"), count(lit(1)).as("nd")).first()
    val avgdl = nl.getLong(0).toDouble / nl.getLong(1)
    val joinable = posts.filter(col("df") >= 2 && col("df") <= maxDf)
    // w depends on the shingle alone, so the shared-idf sum is symmetric
    val dots = joinable.select(col("doc_id").as("qa"), col("shingle"), col("w"))
      .join(joinable.select(col("doc_id").as("qb"), col("shingle")), "shingle")
      .filter(col("qa") < col("qb"))
      .groupBy(col("qa"), col("qb"))
      .agg(sum(col("w")).as("sidf"))
    val sym = dots.select(col("qa").as("query_id"), col("qb").as("doc_id"), col("sidf"))
      .unionByName(dots.select(col("qb").as("query_id"), col("qa").as("doc_id"), col("sidf")))
    val scored = sym
      .join(lens.select(col("doc_id"), col("len").as("len_b")), "doc_id")
      .withColumn("score",
        round((col("sidf").cast("double") / lit(1e6)) * lit(k1 + 1.0) /
          (lit(1.0) + lit(k1) * (lit(1.0 - b) + lit(b) * col("len_b") / lit(avgdl))), 6))
    // bounded-heap ranking, same as [[topKFromDots]] — no partition sort
    graft.plans.TopK.topKPerKey(scored, Seq("query_id"),
        Seq(("score", false), ("doc_id", true)), k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 2-D Pareto frontier (skyline): the rows not dominated on a
  * (maximize `hi`, minimize `lo`) objective pair — X dominates Y when
  * X.hi ≥ Y.hi, X.lo ≤ Y.lo, and at least one is strict. The curation
  * use: of all documents, keep the efficient frontier of
  * (tokens gained, stopwords paid) — candidates no other document
  * beats on both axes — as the "best value per quality budget" review
  * set. Same operator serves any cost/benefit screen (price vs rating,
  * latency vs accuracy).
  *
  * The naive formulation is an O(n²) dominance anti-join (that is what
  * the DuckDB oracle runs, at oracle scale). This implementation is
  * the sort-based linear form, bucketed for scale:
  *
  *  1. LOCAL pass: rows are hash-bucketed; within a bucket the rows
  *     reduce to one (hi, min lo) row per distinct `hi` (hash agg),
  *     and a single RUNNING min over that reduced table ordered by
  *     `hi` DESC — frame [unbounded preceding, 1 preceding], a
  *     GROWING frame Spark executes as an O(n) running aggregation,
  *     never the O(n²) recompute-per-row a shrinking
  *     unbounded-FOLLOWING frame costs — yields the best `lo` among
  *     strictly larger `hi`. Undominated (hi, lo) pairs join back to
  *     the original rows on the (bucket, hi, lo) key.
  *  2. GLOBAL pass: the same reduction over the surviving candidates,
  *     unpartitioned. Sound because a global skyline member is
  *     undominated everywhere (so it survives its bucket), and a
  *     dominated row always has a dominator ON the skyline
  *     (transitivity), which therefore reaches the global pass.
  *
  * The single-partition window only ever sees the union of per-bucket
  * frontiers — typically orders of magnitude smaller than the input
  * (frontier of n random points ~ O(log n) per bucket). Exact ties on
  * both axes are kept (neither dominates) and survive the join-back,
  * making the result set-deterministic.
  */
object Skyline {

  /** Rows of `df` (carrying `_hi`/`_lo` objective columns) not
    * dominated within their `part` group. */
  private def undominated(df: DataFrame, part: Seq[String]): DataFrame = {
    val grouped = df.groupBy((part :+ "_hi").map(col): _*)
      .agg(min(col("_lo")).as("_mlo"))
    val byHiDesc = Window.partitionBy(part.map(col): _*).orderBy(col("_hi").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = grouped
      .withColumn("_best_above", min(col("_mlo")).over(byHiDesc))
      .filter(col("_best_above").isNull || col("_best_above") > col("_mlo"))
      .select((part :+ "_hi").map(col) :+ col("_mlo").as("_lo"): _*)
    // one frontier row per (part, hi), so the join-back never fans out;
    // it keeps exactly the rows matching (hi, tie-min lo) — duplicates
    // (exact ties) survive together
    df.join(front, part ++ Seq("_hi", "_lo"))
  }

  /** Frontier of `df` on (maximize `hi`, minimize `lo`); any orderable
    * numeric columns. */
  def frontier2D(df: DataFrame, hi: Column, lo: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val base = df
      .withColumn("_hi", hi).withColumn("_lo", lo)
      .withColumn("_bkt", pmod(hash(struct(df.columns.map(col): _*)), lit(buckets)))
    val local = undominated(base, Seq("_bkt")).drop("_bkt")
    undominated(local, Seq.empty).drop("_hi", "_lo")
  }

  /** The graded curation screen: documents on the (n_tokens ↑,
    * n_stopwords ↓) frontier, with their coordinates. */
  def docFrontier(documents: DataFrame): DataFrame = {
    val q = graft.text.TextOps.qualityScores(documents)
      .select(col("doc_id"), col("n_tokens"), col("n_stopwords"))
    frontier2D(q, col("n_tokens"), col("n_stopwords"))
      .orderBy(col("doc_id"))
  }
}

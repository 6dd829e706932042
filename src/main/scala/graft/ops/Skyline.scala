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
  *  1. LOCAL pass: rows are hash-bucketed; within a bucket, a window
  *     ordered on `hi` finds for each row the best (min) `lo` among
  *     rows with strictly larger `hi` (integer RANGE frame
  *     [1 FOLLOWING, ∞)) and among `hi`-ties — two frame minima, no
  *     pairwise work. Locally dominated rows are discarded.
  *  2. GLOBAL pass: the same two windows over the surviving
  *     candidates, unpartitioned. Sound because a global skyline
  *     member is undominated everywhere (so it survives its bucket),
  *     and a dominated row always has a dominator ON the skyline
  *     (transitivity), which therefore reaches the global pass.
  *
  * The single-partition window only ever sees the union of per-bucket
  * frontiers — typically orders of magnitude smaller than the input
  * (frontier of n random points ~ O(log n) per bucket). All
  * comparisons are on exact integers; ties on both axes are kept
  * (neither dominates), making the result set-deterministic.
  */
object Skyline {

  private def undominated(df: DataFrame, part: Seq[Column], hi: Column, lo: Column): DataFrame = {
    val strict = Window.partitionBy(part: _*).orderBy(hi.asc)
      .rangeBetween(1L, Window.unboundedFollowing)
    val ties = Window.partitionBy(part :+ hi: _*)
    df
      .withColumn("_best_above", min(lo).over(strict))
      .withColumn("_best_tie", min(lo).over(ties))
      .filter((col("_best_above").isNull || col("_best_above") > lo) && col("_best_tie") === lo)
      .drop("_best_above", "_best_tie")
  }

  /** Frontier of `df` on (maximize `hi`, minimize `lo`); both columns
    * must be integral (the RANGE frame step is 1). */
  def frontier2D(df: DataFrame, hi: Column, lo: Column, buckets: Int = 64): DataFrame = {
    val local = undominated(
      df.withColumn("_bkt", pmod(hash(struct(df.columns.map(col): _*)), lit(buckets))),
      Seq(col("_bkt")), hi, lo)
    undominated(local.drop("_bkt"), Seq.empty, hi, lo)
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

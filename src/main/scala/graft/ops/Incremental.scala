package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (algebraic) aggregate maintenance — the materialized-view
  * refresh pattern: a 100 TB base table's grouped aggregates are a tiny
  * state table, and a new batch should update them by MERGING states,
  * never by rescanning the base. Works for the algebraic aggregates
  * (count/sum/min/max — and avg as sum/count at read time): the merge
  * of two states is the same aggregation applied to the state union.
  *
  * Plan shape: aggregate the DELTA only (one hash agg over the batch),
  * union with the key-grouped base STATE (grouped-cardinality rows, not
  * base rows), and re-aggregate — the second agg runs over
  * 2×|groups| rows. The base table never appears in the plan; with the
  * state table and delta both small this is broadcast/AQE territory at
  * any base size.
  *
  * [[aggState]] defines the state schema; [[mergeStates]] is
  * associative + commutative (property-tested), so states can also
  * merge hierarchically (hourly → daily → monthly rollup maintenance).
  */
object Incremental {

  /** Build the aggregate state of `df` grouped by `keys` over `valueCol`:
    * (keys..., n, sum_v, min_v, max_v). State columns keep the natural
    * Spark aggregate types (sum widens int → long, double stays double,
    * decimal widens precision) — a long cast here would silently
    * truncate fractional values even though the API is generic. For
    * DECIMAL values, prefer casting the input to a fixed precision
    * first: each sum level widens precision by 10, so deep hierarchical
    * rollups of raw decimals drift toward precision 38. */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge two aggregate states (same key/state schema). */
  def mergeStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).cast("long").as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Refresh: state(base) ⊕ agg(delta) == state(base ∪ delta), with the
    * base appearing only through its state rows. Returns the merged
    * state with a derived mean, ordered by keys for determinism. */
  def refresh(baseState: DataFrame, delta: DataFrame, keys: Seq[String],
              valueCol: String): DataFrame =
    mergeStates(baseState, aggState(delta, keys, valueCol), keys)
      .withColumn("mean_v",
        round(col("sum_v").cast("double") / col("n"), 6))
      .orderBy(keys.map(col): _*)

  // --- distinct-count maintenance ------------------------------------
  // COUNT(DISTINCT) is not algebraic — per-group sets would have to be
  // kept verbatim to merge exactly — so the maintainable state is a
  // mergeable sketch: Apache DataSketches HLL via Spark's
  // hll_sketch_agg / hll_union_agg / hll_sketch_estimate. Union of
  // sketch states is the SAME final sketch as sketching the unioned
  // data (deterministic, property-tested equality), so incremental
  // maintenance loses nothing over recompute; accuracy is the sketch's
  // usual ~1.6% at lgConfigK=12 (tested against exact).

  /** Per-group HLL sketch state of `col`'s distinct values. */
  def distinctState(df: DataFrame, keys: Seq[String], valueCol: String,
                    lgConfigK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgConfigK)").as("hll"))

  /** Merge two distinct-count states (sketch union per group). */
  def mergeDistinctStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(expr("hll_union_agg(hll, true)").as("hll"))

  /** Read the maintained state as per-group approximate distinct counts. */
  def distinctEstimate(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) :+
      expr("hll_sketch_estimate(hll)").as("approx_distinct"): _*)
      .orderBy(keys.map(col): _*)
}

package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality summary a pipeline runs before
  * admitting a new drop of data (the reference pipeline eyeballed its
  * harvested events by hand; at 100 TB that has to be an operator).
  * One row per profiled column: null/non-null counts, distinct count,
  * lexicographic-on-native-type min/max (cast to string only for the
  * uniform output schema), and max string length.
  *
  * Two variants with the same output shape:
  *
  *  - [[profile]] — EXACT distinct counts. Spark rewrites multiple
  *    `count(distinct c)` aggregates into an Expand: the narrow
  *    projection is replicated once per profiled column before one
  *    shuffle. Fine for a handful of columns; the cost is |cols| ×
  *    scan bytes of shuffle input. This variant is oracle-checkable.
  *  - [[profileApprox]] — `approx_count_distinct` (HLL++). No Expand,
  *    ONE pass, one tiny shuffle (fixed-size sketches per column) —
  *    the 100 TB default, at the standard ~2% relative error.
  *
  * All counting aggregates are map-side-combined hash aggs; min/max on
  * the native type keep column-stat pushdown available (parquet
  * min/max can answer them without a full scan when columns are
  * sorted).
  */
object Profiler {

  private def perColumn(df: DataFrame, c: String, distinctExpr: org.apache.spark.sql.Column) = {
    val sc = col(c).cast("string")
    struct(
      lit(c).as("col_name"),
      count(col(c)).as("non_null"),
      (count(lit(1)) - count(col(c))).as("nulls"),
      distinctExpr.as("distinct_cnt"),
      min(col(c)).cast("string").as("min_value"),
      max(col(c)).cast("string").as("max_value"),
      coalesce(max(length(sc)), lit(0)).cast("long").as("max_len"))
  }

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctOf: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    // One wide aggregation row (a struct per column), then inline() back
    // to long format — the pivot is plan-side, never a driver collect.
    val structs = cols.zipWithIndex.map { case (c, i) =>
      perColumn(df, c, distinctOf(c)).as(s"__p$i") }
    df.agg(structs.head, structs.tail: _*)
      .select(inline(array(cols.indices.map(i => col(s"__p$i")): _*)))
      .orderBy(col("col_name"))
  }

  /** Exact profile (oracle-checkable; Expand-based multi-distinct). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => count_distinct(col(c)))

  /** One-pass approximate profile — the at-scale default. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))
}

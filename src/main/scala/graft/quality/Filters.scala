package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-relative filtering — "drop the tails" expressed against
  * the corpus's own quantiles rather than magic constants. The classic
  * corpus-curation use: document length (or any quality score) outside
  * [p_lo, p_hi] is boilerplate-short or concatenation-long junk; fixed
  * thresholds rot as the corpus mix drifts, quantile bands don't.
  *
  * Computes the two boundaries as a [[graft.ops.Scalar]]-class
  * construction-time reduction (one agg job → two driver doubles folded
  * into the filter as literals — the filter itself then pushes down to
  * the scan like any literal predicate). `exact = true` uses Spark's
  * exact interpolating `percentile` (matches DuckDB `quantile_cont`,
  * the oracle-checked path); `exact = false` uses `approx_percentile`,
  * the one-pass sketch for corpus scale where a ±0.1-percentile
  * boundary wobble is immaterial.
  */
object Filters {

  def quantileBand(df: DataFrame, column: String, pLo: Double, pHi: Double,
                   exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo <= pHi, s"bad band [$pLo, $pHi]")
    val qs =
      if (exact) df.agg(
        expr(s"percentile($column, array($pLo, $pHi))").as("q"))
      else df.agg(
        expr(s"approx_percentile($column, array($pLo, $pHi), $accuracy)").as("q"))
    val row = qs.select(element_at(col("q"), 1).cast("double"),
      element_at(col("q"), 2).cast("double")).first()
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    df.filter(col(column).cast("double") >= lo &&
      col(column).cast("double") <= hi)
  }
}

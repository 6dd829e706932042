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

  /** Winsorized mean per group — the robust-location sibling of
    * [[madOutliers]]: instead of DROPPING tail rows, CLIP values to the
    * group's own [pLo, pHi] quantiles and average (every row still
    * votes, outliers just lose leverage — the estimator survey-stats
    * and metric pipelines prefer when discarding rows biases the
    * denominator).
    *
    * Determinism: group quantiles come from ONE array-percentile agg,
    * round to 4 dp (the q24-proven cross-engine contract); clipped
    * values are 4-decimal by construction so the mean is an exact
    * DECIMAL sum ÷ count — one final double division (the
    * [[graft.ops.Num]] discipline).
    *
    * Scale shape: one buffering percentile agg to group cardinality
    * (materialized once — the [[graft.ops.Rollups.priceBoxplot]]
    * lesson), broadcast back, then one codegen'd clip + hash agg pass.
    * No window, no sort, nothing corpus-sized shuffles twice. */
  def winsorizedMeans(df: DataFrame, groupCol: String, valueCol: String,
                      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band [$pLo, $pHi]")
    val qs = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, array($pLo, $pHi))").as("ps"))
      .select(col(groupCol),
        round(element_at(col("ps"), 1), 4).as("lo"),
        round(element_at(col("ps"), 2), 4).as("hi"))
      .localCheckpoint()
    val v = col(valueCol).cast("double")
    val clipped = least(greatest(v, col("lo")), col("hi"))
      .cast(org.apache.spark.sql.types.DecimalType(14, 4))
    df.join(broadcast(qs), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(v < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(v > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        (sum(clipped).cast("double") / count(lit(1))).as("win_mean"))
      .select(col(groupCol), col("n"), col("lo"), col("hi"),
        col("n_clip_lo"), col("n_clip_hi"), col("win_mean"))
      .orderBy(col(groupCol))
  }

  /** Robust (median/MAD) outlier filter — the curation-pipeline
    * companion to [[quantileBand]]: quantile bands need a chosen
    * percentile, MAD adapts to the data's own spread and is immune to
    * the outliers it removes (mean/stddev fences are not — one 1 GB
    * document drags the mean). Keeps rows with
    * |x − median| <= k · MAD, MAD = median(|x − median|), k=3 ≈ the
    * classic "3 sigma" for normal data (1 MAD ≈ 0.6745 σ).
    *
    * Two [[graft.ops.Scalar]]-class exact-percentile reductions at
    * construction, then the fence folds to LITERALS — the filter pushes
    * to the parquet scan exactly like quantileBand's (PlanSpec-gated).
    * Exact `percentile` keeps it oracle-portable; at corpus scale
    * substitute approx_percentile the same way quantileBand does. */
  def madOutliers(df: DataFrame, column: String, k: Double = 3.0): DataFrame = {
    val med = df.agg(expr(s"percentile($column, 0.5)").cast("double"))
      .first().getDouble(0)
    val mad = df.agg(
        expr(s"percentile(abs(CAST($column AS DOUBLE) - $med), 0.5)").cast("double"))
      .first().getDouble(0)
    df.filter(abs(col(column).cast("double") - med) <= k * mad)
  }
}

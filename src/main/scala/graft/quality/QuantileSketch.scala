package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded equi-width histogram quantile sketch — the QUANTILE member
  * of the mergeable-sketch family ([[graft.text.HyperLogLog]] distinct,
  * [[graft.text.CountMin]] frequency, [[graft.text.Bloom]] membership):
  * per group, a ≤`buckets`-row counter table over
  * bucket = min(value div width, buckets−1), mergeable by counter
  * ADDITION (so per-shard/per-day histograms compose into the corpus
  * histogram without a re-scan, and the streamed form is the
  * [[graft.stream.CorpusStream]] counter-add skeleton verbatim).
  *
  * Everything is integer-exact, hence oracle-portable: the rank target
  * is r = ⌈q·n⌉ = (q_milli·n + 999) div 1000, the estimate is the
  * UPPER BOUND of the first bucket whose cumulative count reaches r
  * ((bucket+1)·width − 1, the sketch's resolution-limited answer), and
  * the exact twin — the true type-1 order statistic, smallest value
  * whose cumulative count reaches r — is graded alongside so the
  * sketch error is visible, the same est/exact contract as the HLL
  * queries. No interpolation, no doubles anywhere.
  *
  * Scale shape: ONE hash aggregation to the bounded histogram, window
  * cumsums over ≤buckets rows per group, and the exact twin's
  * per-distinct-value table (bounded by the value domain, not the row
  * count — affordable for the integer quality metrics this targets; at
  * true corpus scale run the sketch columns alone). Nonnegative values
  * only (counts, token lengths, byte sizes — the curation metrics). */
object QuantileSketch {

  /** (grp, bucket, cnt): the mergeable histogram. */
  def build(df: DataFrame, grp: Column, value: Column,
            width: Long, buckets: Int): DataFrame =
    df.select(grp.as("grp"), value.cast("long").as("v"))
      .select(col("grp"), least(expr(s"v div $width"), lit(buckets - 1L)).as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Counter-addition merge — two histograms of disjoint (or any)
    * row sets sum to the histogram of the union. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("grp"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-group quantile estimates from the sketch next to the exact
    * order statistic: (grp, q_milli, est_hi, exact_v, n), all BIGINT.
    * `qMillis` are quantiles in thousandths (500 = median). */
  def quantiles(df: DataFrame, grpCol: Column, value: Column,
                width: Long, buckets: Int, qMillis: Seq[Int]): DataFrame = {
    val base = df.select(grpCol.as("grp"), value.cast("long").as("v"))
      .localCheckpoint() // histogram + exact twin + counts re-consume
    val hist = build(base, col("grp"), col("v"), width, buckets)
    val ns = base.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    estimatesFrom(hist, ns, width, buckets, qMillis)
      .join(exactTwin(base, qMillis), Seq("grp", "q_milli"))
      .select(col("grp"), col("q_milli"), col("est_hi"), col("exact_v"), col("n"))
      .orderBy(col("grp"), col("q_milli"))
  }

  /** Quantile estimates from a PREBUILT histogram (one that may have
    * been merged across shards/days or maintained under a stream) plus
    * per-group row counts: (grp, q_milli, n, est_hi). Split out of
    * [[quantiles]] so merged/maintained histograms grade through the
    * identical rank arithmetic. */
  def estimatesFrom(hist: DataFrame, ns: DataFrame, width: Long,
                    buckets: Int, qMillis: Seq[Int]): DataFrame = {
    val qs = ns.select(col("grp"), col("n"),
        explode(typedlit(qMillis.map(_.toLong))).as("q_milli"))
      .withColumn("r", expr("(q_milli * n + 999) div 1000"))
    val wB = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumHist = hist.withColumn("cum", sum(col("cnt")).over(wB))
    qs.join(cumHist, Seq("grp"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("grp"), col("q_milli"), col("n"))
      .agg(min(col("bucket")).as("bkt"))
      // interior buckets carry the tight width-wide upper bound; the
      // LAST bucket also absorbs clamped values >= width*buckets (see
      // [[build]]'s least()), so its only sound upper bound is
      // unbounded — Long.MaxValue keeps the est_hi >= exact contract
      // universal instead of silently violating it past the domain
      .withColumn("est_hi",
        when(col("bkt") === lit(buckets - 1L), lit(Long.MaxValue))
          .otherwise((col("bkt") + 1L) * lit(width) - 1L))
  }

  /** Log-width histogram: bucket = bit length of v (0 for v = 0), so
    * 64 buckets cover EVERY nonnegative long — the unbounded-domain
    * complement of [[build]]'s equi-width form, with a RELATIVE error
    * bound instead of an absolute one: the bucket upper bound
    * 2^b − 1 < 2·v for any v ≥ 1, so est_hi/exact < 2 always, no
    * clamp bucket, no domain sizing. Same counter-addition merge
    * ([[merge]] works verbatim), same ≤64-row-per-group exchange
    * shape. Bit length is the HLL sum-of-comparisons form — one
    * comparison per power of two, exactly replayable in oracle SQL
    * with no string rendering. */
  def buildLog(df: DataFrame, grp: Column, value: Column): DataFrame =
    df.select(grp.as("grp"), value.cast("long").as("v"))
      .select(col("grp"),
        (0 until 63).map(k => when(col("v") >= lit(1L << k), 1L).otherwise(0L))
          .reduce(_ + _).as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Per-group quantile estimates from the log sketch beside the exact
    * order statistic: (grp, q_milli, est_hi, exact_v, n), all BIGINT;
    * est_hi = 2^bucket − 1, the largest value of that bit length —
    * within 2× of the true order statistic by construction. Values
    * must be nonnegative (same contract as [[quantiles]]). */
  def logQuantiles(df: DataFrame, grpCol: Column, value: Column,
                   qMillis: Seq[Int]): DataFrame = {
    val base = df.select(grpCol.as("grp"), value.cast("long").as("v"))
      .localCheckpoint() // histogram + exact twin + counts re-consume
    val hist = buildLog(base, col("grp"), col("v"))
    val ns = base.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    logEstimatesFrom(hist, ns, qMillis)
      .join(exactTwin(base, qMillis), Seq("grp", "q_milli"))
      .select(col("grp"), col("q_milli"), col("est_hi"), col("exact_v"), col("n"))
      .orderBy(col("grp"), col("q_milli"))
  }

  /** Rank selection over a prebuilt log histogram (merged across
    * shards/days or maintained under a stream) — the
    * [[estimatesFrom]] split for the log form. est_hi = 2^bkt − 1 by
    * exact integer shift on both engines. */
  def logEstimatesFrom(hist: DataFrame, ns: DataFrame,
                       qMillis: Seq[Int]): DataFrame = {
    val qs = ns.select(col("grp"), col("n"),
        explode(typedlit(qMillis.map(_.toLong))).as("q_milli"))
      .withColumn("r", expr("(q_milli * n + 999) div 1000"))
    val wB = Window.partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumHist = hist.withColumn("cum", sum(col("cnt")).over(wB))
    qs.join(cumHist, Seq("grp"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("grp"), col("q_milli"), col("n"))
      .agg(min(col("bucket")).as("bkt"))
      .withColumn("est_hi",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bkt AS INT)) - 1"))
  }

  /** Trailing-window quantiles by HISTOGRAM MERGE — the payoff of the
    * counter-addition merge law: per day, the quantiles of the
    * trailing `window` days come from summing ≤64-row daily log
    * histograms, never re-scanning rows (the HLL trailing-window
    * story, for ranks). Each daily histogram fans out to the `window`
    * spine days it serves via a narrow explode (row count ×window on
    * the TINY histogram table, nothing pairwise, no range join), then
    * one hash agg re-merges per (day, bucket). The exact twin joins
    * RAW rows to the spine the same explode way — affordable at
    * fixture scale, grading-only at corpus scale (run the sketch
    * columns alone there; the documented [[quantiles]] caveat).
    * Returns (day, q_milli, est_hi, exact_v, n) — n = trailing-window
    * row count; days with fewer than `window` predecessors merge what
    * exists (expanding window at the head). */
  def trailingLogQuantiles(df: DataFrame, dayCol: Column, value: Column,
                           window: Int, qMillis: Seq[Int]): DataFrame = {
    val base = df.select(dayCol.cast("long").as("day"), value.cast("long").as("v"))
      .localCheckpoint() // daily histograms + exact twin re-consume
    trailingFromDailyLog(buildLog(base, col("day"), col("v")).localCheckpoint(),
      base, window, qMillis)
  }

  /** The [[trailingLogQuantiles]] tail over a PREBUILT (grp = day,
    * bucket, cnt) daily log histogram — split out so a histogram
    * MAINTAINED under a stream grades through the identical trailing
    * merge and rank arithmetic (the [[estimatesFrom]] discipline).
    * `base` supplies the raw (day, v) rows for the exact twin only. */
  def trailingFromDailyLog(daily: DataFrame, base: DataFrame,
                           window: Int, qMillis: Seq[Int]): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val days = base.select(col("day")).distinct()
    def fanOut(d: DataFrame, dayC: String): DataFrame = d
      .withColumn("grp",
        explode(expr(s"sequence($dayC, $dayC + ${window - 1}L)")))
      .join(broadcast(days.select(col("day").as("grp"))), "grp")
    val merged = fanOut(daily.withColumnRenamed("grp", "hday"), "hday")
      .groupBy(col("grp"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val ns = merged.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val winRows = fanOut(base, "day").select(col("grp"), col("v"))
    logEstimatesFrom(merged, ns, qMillis)
      .join(exactTwin(winRows, qMillis), Seq("grp", "q_milli"))
      .select(col("grp").as("day"), col("q_milli"), col("est_hi"),
        col("exact_v"), col("n"))
      .orderBy(col("day"), col("q_milli"))
  }

  /** The exact type-1 order statistic per (grp, q_milli) from the raw
    * (grp, v) rows — the graded truth the sketch estimate sits beside. */
  def exactTwin(base: DataFrame, qMillis: Seq[Int]): DataFrame = {
    val ns = base.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val qs = ns.select(col("grp"), col("n"),
        explode(typedlit(qMillis.map(_.toLong))).as("q_milli"))
      .withColumn("r", expr("(q_milli * n + 999) div 1000"))
    val byValue = base.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt"))
    val wV = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumVal = byValue.withColumn("cum", sum(col("cnt")).over(wV))
    qs.join(cumVal, Seq("grp"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("grp"), col("q_milli"))
      .agg(min(col("v")).as("exact_v"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.5).
  *
  * Re-expresses the reference's rollup family — parametric group-by/count
  * (`/root/reference/simple-analyses.py:9-18`), SQL COUNT+GROUP BY rollups
  * (`athena.sql:18-29`) — plus the north-star additions (sum/avg/min/max,
  * count-distinct, ROLLUP/CUBE/GROUPING SETS).
  *
  * Scale notes: every function here compiles to partial (map-side) + final
  * hash aggregation with whole-stage codegen; the only shuffle is on the
  * grouping keys. Sorts are placed after aggregation, so the global
  * range-partitioned sort sees only the (small) aggregated output.
  */
object Rollups {

  /** Generic group-by/count over arbitrary key columns, sorted by keys —
    * the direct analogue of `by_group` at `simple-analyses.py:9-18`. */
  def countBy(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).count()
      .withColumnRenamed("count", "cnt")
      .orderBy(keys.map(col): _*)

  /** TPC-H Q1-shaped pricing summary over lineitem: the flagship batch
    * aggregation. Exact decimal sums (see [[Num]]). */
  def pricingSummary(lineitem: DataFrame, shipBefore: String = "1999-09-02"): DataFrame = {
    import Num._
    val disc  = dec2(col("l_extendedprice")) * (oneDec - dec2(col("l_discount")))
    val charge = disc * (oneDec + dec2(col("l_tax")))
    lineitem
      .filter(col("l_shipdate") <= to_timestamp_ntz(lit(shipBefore)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** ROLLUP over (status, priority): subtotal + grand-total rows.
    * Null grouping keys sort first to match the oracle's NULLS FIRST. */
  def ordersRollup(orders: DataFrame): DataFrame =
    orders.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), Num.sumMoney(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** CUBE over (returnflag, linestatus). */
  def lineitemCube(lineitem: DataFrame): DataFrame =
    lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(Num.sumMoney(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** GROUPING SETS — per-status, per-priority, and grand-total rows in
    * one pass (SURVEY §2.5 north-star addition alongside rollup/cube). */
  def ordersGroupingSets(orders: DataFrame): DataFrame =
    orders.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), Num.sumMoney(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Approximate distinct counting (HLL++) next to the exact count —
    * the cardinality-sketch member of the aggregate family. Error bound
    * asserted in tests; not oracle-comparable (engine-specific sketch). */
  def approxDistinctParts(lineitem: DataFrame, rsd: Double = 0.05): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx"))
      .orderBy(col("l_returnflag"))

  /** Exact distinct-count rollup (the `StringIndexer`-style distinct
    * collection of SURVEY §2.5 A7, generalized). */
  def distinctCounts(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows")
      )
      .orderBy(col("l_returnflag"))

  /** Top-N by a measure (the reference's preview/limit shape, SURVEY §2.7
    * W3, made deterministic with a full sort + tiebreak key). */
  def topNOrders(orders: DataFrame, n: Int = 10): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(n)

  /** Exact interpolated percentiles (median + quartiles) per group.
    * Rounded to 4dp: Spark and DuckDB share the interpolation
    * definition but may associate the fp arithmetic differently. */
  def quantityPercentiles(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"))
      .orderBy(col("l_returnflag"))

  /** Value-histogram: fixed-width bucket counts via integer arithmetic
    * (no fp ambiguity). */
  def histogram(df: DataFrame, valueCol: String, width: Int): DataFrame =
    df.groupBy(floor(col(valueCol) / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("bucket"))

  /** Pivot (long → wide): order priorities × order status, exact money
    * sums. The status domain is pinned explicitly — with pivot values
    * supplied, Spark skips the distinct-collect pre-pass and plans ONE
    * hash aggregation with per-status conditional partials (same shape as
    * the FILTER-clause oracle), so the pivot costs exactly one shuffle of
    * |priorities| × 3 cells. Empty cells stay NULL (both engines). */
  def priorityStatusPivot(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(Num.sumMoney(col("o_totalprice")))
      .withColumnsRenamed(Map("F" -> "sum_f", "O" -> "sum_o", "P" -> "sum_p"))
      .orderBy(col("o_orderpriority"))

  /** Pearson correlation per group from EXACT decimal co-moments.
    * `corr()` built-ins accumulate doubles and are order-sensitive under
    * partial aggregation (and numerically different between engines);
    * here Σx, Σy, Σxy, Σx², Σy², n are exact DECIMAL sums of 2-decimal
    * inputs — order-insensitive, bit-identical to the oracle — and the
    * textbook formula is ONE fixed-shape double expression over them.
    * Same single-shuffle partial+final hash agg as any sum. */
  def quantityPriceCorr(lineitem: DataFrame): DataFrame = {
    import Num._
    val x = dec2(col("l_quantity")); val y = dec2(col("l_extendedprice"))
    val n = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    lineitem.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6).as("corr"))
      .orderBy(col("l_returnflag"))
  }

  /** Per-group ordinary-least-squares fit (price on quantity) from the
    * same EXACT decimal co-moments as [[quantityPriceCorr]] — the
    * closed-form slope/intercept/R², each as ONE fixed-shape double
    * expression over bit-identical sums, so the result matches the
    * oracle despite being floating-point. One shuffle (partial+final
    * hash agg); the per-group regression a drift monitor or
    * per-source trend report runs at any scale. */
  def quantityPriceRegression(lineitem: DataFrame): DataFrame = {
    import Num._
    val x = dec2(col("l_quantity")); val y = dec2(col("l_extendedprice"))
    val n = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    lineitem.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).as("slope"),
        round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 6).as("intercept"),
        round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
          ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Per-group MODE (most frequent value, smallest-value tiebreak —
    * total order, so engine-deterministic). Two hash aggregations and a
    * group-keyed window over the (tiny) count table; the raw table
    * shuffles once, on (group, value). */
  def quantityModes(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = lineitem.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_quantity"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
      .orderBy(col("l_returnflag"))
  }

  /** Geometric and harmonic means per group — the multiplicative /
    * rate-averaging complements of [[Num.avgMoney]]. Each per-row term
    * (ln x, 1/x) is irrational, so it rounds to a fixed scale and sums
    * EXACTLY — as scaled LONGS, not decimals: long hash-agg codegen JITs
    * ~10× cheaper (the [[graft.sim.SparseSim]] micro-unit rule), and
    * `round(x·1e9, 0)` not `round(x, 9)·1e9` because the 9-dp double is
    * not exactly k/1e9. Headroom: |ln x|·1e9 ≤ 1.2e10 and (1/x)·1e14 ≤
    * 1.2e11 per row keep a group exact to ~10⁸ rows; beyond that, shard
    * the sum (sub-key long partials, decimal combine). The final exp /
    * division are single double ops. Values must be positive — enforced
    * by the money columns' domain. */
  def priceMeans(lineitem: DataFrame): DataFrame = {
    val x = col("l_extendedprice")
    val lnTerm = round(log(x) * lit(1e9), 0).cast("long")
    val invTerm = round(lit(1e14) / x, 0).cast("long")
    lineitem.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(lnTerm).as("sln"), sum(invTerm).as("sinv"))
      .select(col("l_returnflag"), col("n"),
        round(exp(col("sln").cast("double") / lit(1e9) / col("n")), 4).as("geo_mean"),
        round(col("n") / (col("sinv").cast("double") / lit(1e14)), 4).as("harm_mean"))
      .orderBy(col("l_returnflag"))
  }

  /** Boxplot statistics per group: quartiles, IQR, Tukey fences
    * (1.5·IQR) and the outlier count beyond them — the standard
    * distribution-summary table. Quartiles are exact interpolating
    * percentiles rounded 4 dp (the q24 contract); fences are one
    * fixed-shape double expression from them; outlier counting is a
    * conditional aggregate against those same values, all inside the
    * one grouped pass (percentile + count_if share the shuffle). */
  def priceBoxplot(lineitem: DataFrame): DataFrame = {
    // ONE array-percentile agg (one sort buffer, not three) — and the
    // group-cardinality result is materialized so the value-buffering
    // aggregation doesn't re-run for each of its two consumers below
    // Fences on the exact integer ten-thousandths grid: p25/p75 are
    // 4dp-rounded, so ×10⁴ recovers exact longs, and 1.5·IQR lives on
    // the HALF grid (2e-5 units) — `round(p25 - 1.5·iqr, 4)` put a
    // fixture value exactly on the .00005 boundary where engine ulp
    // noise decided the direction (sf0.001 hash mismatch). Integer
    // arithmetic + ONE correctly-rounded division is bit-identical.
    val qs = lineitem.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ps"))
      .select(col("l_returnflag"), col("n"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"))
      .withColumn("p25i", round(col("p25") * 10000, 0).cast("long"))
      .withColumn("p75i", round(col("p75") * 10000, 0).cast("long"))
      .withColumn("iqr",
        (col("p75i") - col("p25i")).cast("double") / 10000.0)
      .withColumn("lo_fence",
        (col("p25i") * 2 - (col("p75i") - col("p25i")) * 3).cast("double") / 20000.0)
      .withColumn("hi_fence",
        (col("p75i") * 2 + (col("p75i") - col("p25i")) * 3).cast("double") / 20000.0)
      .drop("p25i", "p75i")
      .localCheckpoint()
    // second pass counts outliers against the broadcast fences (an
    // aggregate can't reference a sibling aggregate in one pass)
    val outliers = lineitem
      .join(broadcast(qs.select(col("l_returnflag"), col("lo_fence"), col("hi_fence"))),
        "l_returnflag")
      .filter(col("l_extendedprice") < col("lo_fence") ||
        col("l_extendedprice") > col("hi_fence"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_outliers"))
    qs.join(outliers, Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("n"), col("p25"), col("p50"), col("p75"),
        col("iqr"), col("lo_fence"), col("hi_fence"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
      .orderBy(col("l_returnflag"))
  }

  /** Dense monthly counts — gap-filled time series: months with no
    * orders appear with 0 instead of silently missing (the calendar-
    * spine/reporting staple, and the correct input shape for lag/MoM
    * deltas like [[Windows.monthlyOrderDeltas]]). The spine derives
    * lazily from the data's own [min, max] month via one tiny agg +
    * sequence explode (no Scalar action, no literal calendar); month
    * index arithmetic is pure integers (y·12+m−1), tz-free and engine-
    * portable. Left join on the spine is spine-sized — trivially
    * broadcast. */
  def monthlyOrderCountsDense(orders: DataFrame): DataFrame = {
    val monthly = orders.groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n"))
      .withColumn("idx", col("y") * 12 + col("m") - 1)
    val spine = monthly.agg(min(col("idx")).as("lo"), max(col("idx")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("idx"))
    spine.join(monthly.select(col("idx"), col("n")), Seq("idx"), "left")
      .select(expr("idx div 12").as("y"), (col("idx") % 12 + 1).as("m"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
      .orderBy(col("y"), col("m"))
  }

  /** Conditional aggregates per group — count_if / bool_and / bool_or
    * (ANSI FILTER-clause class, one agg pass, no self-joins). */
  def lineStatusFlags(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag"))
      .agg(
        count_if(col("l_quantity") >= 25).as("n_bulk"),
        bool_and(col("l_discount") <= 0.1).as("all_low_disc"),
        bool_or(col("l_tax") > 0.07).as("any_high_tax"))
      .orderBy(col("l_returnflag"))

  /** Ordered string aggregation (LISTAGG class): top-3 parts per brand
    * by retail price, joined into one csv cell. Order inside the cell is
    * total (price desc, name) so the string is deterministic; the heavy
    * table never sorts globally — TopK bounds each group first. */
  def brandTopPartsCsv(part: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_name"))
    part.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("p_brand"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("rn"), col("p_name")))),
          x => x.getField("p_name")), ",").as("top_parts"))
      .orderBy(col("p_brand"))
  }

  /** Unpivot (wide → long / melt): per-returnflag exact metric sums to
    * (flag, metric, value) rows. The melt itself is a zero-shuffle
    * `Expand` over the (tiny) aggregated wide table — the 100 TB shape:
    * aggregate first, reshape after. */
  def returnflagMetricsLong(lineitem: DataFrame): DataFrame = {
    import Num._
    val wide = lineitem.groupBy(col("l_returnflag"))
      .agg(sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_price"),
        sumMoney(col("l_discount")).as("sum_disc"))
    wide.unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }
}

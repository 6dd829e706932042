package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window/analytic operators (SURVEY.md §2.7 north-star additions:
  * the reference has no ranking/frame windows; we add the standard set
  * as verified operators).
  *
  * Scale notes: a window = one shuffle on the partition keys + an
  * in-partition sort. Partition keys are chosen high-cardinality
  * (custkey, user) so no single partition explodes; global-ORDER-BY
  * windows are applied only to pre-aggregated (small) inputs.
  */
object Windows {

  /** Top-N rows per group via row_number with a deterministic tiebreak. */
  def topOrdersPerCustomer(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Month-over-month delta via lag() over a pre-aggregated rollup —
    * the "events per month with MoM delta" shape from SURVEY §2.7. */
  def monthlyOrderDeltas(orders: DataFrame): DataFrame = {
    val monthly = orders.groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("y"), col("m"))
    monthly
      .withColumn("delta", col("n_orders") - coalesce(lag(col("n_orders"), 1).over(w), lit(0L)))
      .orderBy(col("y"), col("m"))
  }

  /** Running total per customer (exact decimal frame sum → stable
    * against the oracle; see [[Num]]). */
  def runningSpendPerCustomer(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.select(
        col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        sum(Num.dec2(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** RANGE-frame trailing 7-day spend per customer — the interval frame
    * (all orders within the previous 6 days + today, however many rows)
    * that rows-frames can't express. Ordered by epoch-day so the frame
    * bound is integer arithmetic in both engines. */
  def trailingWeekSpend(orders: DataFrame): DataFrame = {
    val dayN = datediff(to_date(col("o_orderdate")),
      lit("1970-01-01").cast("date")).cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(dayN)
      .rangeBetween(-6, 0)
    orders.select(
        col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        sum(Num.dec2(col("o_totalprice"))).over(w).cast("double").as("trailing_7d_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Scalable GLOBAL running sum over a unique order column — the
    * two-phase replacement for `Window.orderBy(...)` with no partition
    * key, which collapses the whole dataset into one task. Phase 1:
    * bucket rows by approx-quantile boundaries of the order column and
    * running-sum WITHIN each bucket (partitioned window). Phase 2:
    * per-bucket totals (tiny — `nBuckets` rows) get prefix offsets via a
    * driver-safe global window, broadcast back, and added to the local
    * sums. Results are identical to the single-partition form when
    * `orderCol` is unique (ties at a bucket boundary would otherwise
    * split nondeterministically — same caveat the naive form has for tie
    * ORDER).
    *
    * NOTE: calling this EXECUTES the input pipeline immediately (the
    * quantile probe is an action and the input is checkpointed for its
    * three consumers) — unlike most operators here, the returned
    * DataFrame is not a fully lazy plan (the [[Scalar]] convention). */
  def globalRunningSum(df: DataFrame, orderCol: String, valueCol: Column,
                       out: String, nBuckets: Int = 64): DataFrame = {
    // three consumers (quantile probe, bucket totals, local sums) —
    // materialize the input once or the upstream lineage re-executes
    // per consumer; callers pass narrow (key, value) projections
    val input = df.localCheckpoint()
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = input.stat.approxQuantile(orderCol, probs, 0.001).distinct.sorted
    // bucket = #boundaries below the value, via one HOF pass over the
    // literal bounds array (a nested when-chain here compiles a
    // boundary-count-deep CaseWhen tree — measured ~10 s of codegen at
    // 64 buckets)
    val bucketExpr = size(filter(array(bounds.toIndexedSeq.map(lit(_)): _*),
      b => col(orderCol) > b))
    val withB = input.withColumn("__b", bucketExpr)
    val wIn = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withB.withColumn("__local", sum(valueCol).over(wIn))
    val totals = withB.groupBy(col("__b")).agg(sum(valueCol).as("__t"))
    val wPre = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the coalesce zero is cast to the bucket-sum's own type so the
    // output type never depends on bigint-literal coercion (decimal
    // inputs would otherwise resolve through coercion rules and could
    // diverge from the single-partition window form's type)
    val sumType = totals.schema("__t").dataType
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__t")).over(wPre), lit(0).cast(sumType)))
      .select(col("__b"), col("__off"))
    local.join(broadcast(offsets), "__b")
      .withColumn(out, col("__local") + col("__off"))
      .drop("__b", "__local")
  }

  /** rank/dense_rank over value within a group (supplier balances per
    * nation). */
  def supplierBalanceRanks(supplier: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc, col("s_suppkey"))
    supplier.select(
        col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc)).cast("long").as("rnk"))
      .orderBy(col("s_nationkey"), col("rn"))
  }

  /** Top-k-WITH-TIES per group via dense_rank — the tie-preserving
    * sibling of [[topOrdersPerCustomer]]/TopKPerKey: every part sharing
    * one of the k highest retail prices of its brand survives, so group
    * output size is data-dependent (ties never drop arbitrarily). Same
    * single keyed exchange + in-partition sort as any ranking window. */
  def topPricesPerBrandWithTies(part: DataFrame, k: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
    part.withColumn("dr", dense_rank().over(w).cast("long"))
      .filter(col("dr") <= k)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("dr"))
      .orderBy(col("p_brand"), col("dr"), col("p_partkey"))
  }

  /** first_value / last_value / nth_value over each customer's order
    * history (full-partition frame so last_value sees the true last row,
    * not the running default frame — the classic frame-clause trap).
    * Unique (date, key) ordering keeps all three deterministic. */
  def orderBookends(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders.select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Share-of-total per group: one hash agg, then the percent-of-total
    * division against the grand total — computed by a second tiny agg
    * joined back (NOT an unpartitioned window over raw rows; over the
    * ≤|groups| aggregate it would also be fine, but the broadcast join
    * form keeps the plan shape obvious). */
  def revenueShares(orders: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_orderpriority"))
      .agg(Num.sumMoney(col("o_totalprice")).as("revenue"))
    val tot = orders.agg(Num.sumMoney(col("o_totalprice")).as("total"))
    per.crossJoin(broadcast(tot))
      .select(col("o_orderpriority"), col("revenue"),
        round(col("revenue") / col("total"), 6).as("share"))
      .orderBy(col("o_orderpriority"))
  }

  /** Per-group quantile normalization — map a raw quality score to its
    * within-group fractional rank, the cross-source score CALIBRATION
    * step before mixing corpora (a "0.8 quality" from one crawl is not
    * a "0.8" from another; percentiles are comparable). pct ∈ [0, 1]
    * is (rank − 1)/(n_group − 1) under a unique tiebreak (idCol), so
    * the whole column is total-order deterministic and engine-portable
    * (the [[customerBalanceTiles]] argument); single-member groups pin
    * to 0. One exchange on the group key, window over group members —
    * group sizes are corpus-fraction-sized, not corpus-sized. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: Column,
                        valueName: String, idCol: String): DataFrame = {
    // project first, rank by the projected NAME: ordering by the raw
    // expression would re-reference columns the select already dropped
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueName), col(idCol))
    val grp = Window.partitionBy(col(groupCol))
    df.select(col(idCol), col(groupCol), valueCol.as(valueName))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_grp", count(lit(1)).over(grp))
      .withColumn("pct", when(col("n_grp") === 1, lit(0.0))
        .otherwise(round((col("rn") - 1).cast("double") / (col("n_grp") - 1), 9)))
      .select(col(idCol), col(groupCol), col(valueName), col("pct"))
      .orderBy(col(idCol))
  }

  /** Distribution ranks — ntile / percent_rank / cume_dist over customer
    * balances per market segment. The ordering carries a unique tiebreak
    * (custkey), making all three rank functions total-order deterministic
    * and hence engine-portable; fractional ranks round to 6dp (single
    * division, identical in both engines given equal rn/n). Same shuffle
    * shape as every window here: one exchange on the partition key. */
  def customerBalanceTiles(customer: DataFrame, tiles: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    customer.select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(tiles).over(w).cast("long").as("tile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }
}

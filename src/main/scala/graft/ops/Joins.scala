package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join family (SURVEY.md §2.4).
  *
  * The reference materializes no explicit join (its only merge is a
  * glob-scan UNION ALL, `/root/reference/lambda-run-clustering.py:25`), but
  * "same capabilities, Spark-native" over a star schema requires the full
  * family: equi inner/left, broadcast, semi/anti, multiway, range/theta.
  *
  * Scale notes: dimension sides (region/nation/part/supplier, band tables)
  * are broadcast — no shuffle of the fact table; fact-fact joins shuffle on
  * the join key once and AQE handles skew. Aggregations are pushed below
  * sorts so the shuffled data is minimal.
  */
object Joins {

  /** Inner equi-join orders ⋈ customer, revenue rolled up by market
    * segment. Customer is the small side → broadcast hint. */
  def revenueBySegment(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), Num.sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))

  /** Broadcast equi-join lineitem ⋈ part: shipped volume per brand. */
  def brandVolume(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(Num.sumMoney(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))

  /** Left outer join keeping empty customers (zero-filled). */
  def ordersPerCustomer(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(Num.sumMoney(col("o_totalprice")), lit(0.0)).as("total_spent")
      )
      .orderBy(col("c_custkey"))

  /** Left-semi join — the Spark idiom for EXISTS / IN. */
  def customersWithBigOrders(customer: DataFrame, orders: DataFrame, minTotal: Double): DataFrame =
    customer.join(
        orders.filter(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Left-anti join — NOT EXISTS. Parameterized on a minimum order size so
    * the result is non-trivial at any SF (every customer has *some* order). */
  def customersWithoutBigOrders(customer: DataFrame, orders: DataFrame, minTotal: Double): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Multiway star join region ⋈ nation ⋈ customer ⋈ orders; both dims
    * broadcast, single shuffle on the fact side for the final rollup. */
  def regionNationRevenue(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, orders: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), Num.sumMoney(col("o_totalprice")).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))

  /** Range/theta join: classify rows of `df` into [lo, hi) bands from a
    * small band table (broadcast nested-loop — correct plan for a tiny
    * build side; at scale the band table stays tiny so this never
    * shuffles the fact side). */
  def bandJoin(df: DataFrame, bands: DataFrame, valueCol: String): DataFrame =
    df.join(broadcast(bands), col(valueCol) >= col("lo") && col(valueCol) < col("hi"))
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set operators (SURVEY.md §2.7 W4).
  *
  * The reference's only set op is the implicit UNION ALL of historical +
  * streaming parquet under one prefix (`/root/reference/etl-events.py:119`
  * + `lambda-run-clustering.py:25`); we expose it — and INTERSECT/EXCEPT —
  * as explicit verified operators. `unionByName` is the scale-safe form:
  * positional union silently mis-aligns evolving schemas.
  */
object SetOps {

  /** UNION ALL + rollup: nation-key population across customer ∪ supplier. */
  def nationKeyCounts(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val c = customer.select(col("c_nationkey").as("nk"))
    val s = supplier.select(col("s_nationkey").as("nk"))
    c.unionByName(s).groupBy(col("nk")).agg(count(lit(1)).as("cnt")).orderBy(col("nk"))
  }

  /** INTERSECT (distinct): nations having both customers and suppliers. */
  def nationsWithBoth(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nk"))
      .intersect(supplier.select(col("s_nationkey").as("nk")))
      .orderBy(col("nk"))

  /** EXCEPT (distinct): customers who ordered, minus customers who ever
    * placed an order above `minTotal` — non-trivial at any SF. */
  def modestCustomers(orders: DataFrame, minTotal: Double): DataFrame =
    orders.select(col("o_custkey").as("ck"))
      .except(orders.filter(col("o_totalprice") > minTotal).select(col("o_custkey").as("ck")))
      .orderBy(col("ck"))
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Tables

/** The window-top-N optimizer rule: plain `row_number <= k` SQL must
  * plan through the bounded-heap TopKPerKeyExec, produce identical
  * rows to the (rule-free) window plan, and decline the unsafe cases. */
class WindowTopKRewriteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def planStr(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("row_number <= k rewrites to TopKPerKeyExec; rows match the window semantics") {
    val o = Tables.orders(spark, sf)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    assert(planStr(df).contains("TopKPerKey"), "rule must fire")
    assert(!planStr(df).contains("WindowExec"), "window stack must be replaced")
    // referee: compute the same top-3 by collect + group sort (total order)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (ck, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case (t, i) => (ck, t._2, i + 1) }.toSeq
      }.toSet
    assert(got == want)
  }

  test("rn = 1 (argmax idiom) rewrites; residual conjuncts survive") {
    val o = Tables.orders(spark, sf)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val df = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("o_totalprice") > 1000.0)
    assert(planStr(df).contains("TopKPerKey"))
    val got = df.select("o_custkey").as[Long].collect().toSet
    val want = o.collect().map(r =>
        (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"), r.getAs[Double]("o_totalprice")))
      .groupBy(_._1).flatMap { case (_, rows) => Seq(rows.minBy(_._2)) }
      .filter(_._3 > 1000.0).map(_._1).toSet
    assert(got == want)
  }

  test("global top-N (no partition) rewrites and stays exact") {
    val o = Tables.orders(spark, sf)
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("o_orderkey"))
    assert(planStr(df).contains("TopKPerKey"))
    val want = o.select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(t => (-t._2, t._1)).take(5).map(_._1).toSet
    assert(df.as[Long].collect().toSet == want)
  }

  test("rank() and multi-expression windows do NOT rewrite") {
    val o = Tables.orders(spark, sf)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
    val ranked = o.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
    assert(!planStr(ranked).contains("TopKPerKey"), "rank ties admit >k rows")
    val multi = o.withColumn("rn", row_number().over(w))
      .withColumn("lg", lag(col("o_totalprice"), 1).over(w))
      .filter(col("rn") <= 2)
    assert(!planStr(multi).contains("TopKPerKey") || planStr(multi).contains("WindowExec"),
      "a sibling window function must keep its WindowExec")
  }

  test("huge k does not rewrite (memory guard)") {
    val o = Tables.orders(spark, sf)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val df = o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1000000)
    assert(!planStr(df).contains("TopKPerKey"))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
}

/** Batch-1 relational operators: structural invariants + golden counts on
  * sf0.001 (row counts pinned from TESTDATA.md). The value-level gate is
  * the DuckDB oracle (tools/compare_local.py / driver t2). */
class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("entry flagship returns the 6 (returnflag, linestatus) groups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("count_order")).sum <= 6000)
  }

  test("every query runs at sf0.001 and respects its declared schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      assert(df.columns.distinct.length == df.columns.length, s"$name dup columns")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("pricing summary counts partition the filtered lineitem") {
    val li = Tables.lineitem(spark, sf)
    val total = li.filter(col("l_shipdate") <= to_timestamp_ntz(lit("1999-09-02"))).count()
    val agg = Rollups.pricingSummary(li).agg(sum("count_order")).first().getLong(0)
    assert(agg == total)
  }

  test("left join keeps all customers; semi ∪ anti partitions them") {
    val c = Tables.customer(spark, sf); val o = Tables.orders(spark, sf)
    assert(Joins.ordersPerCustomer(c, o).count() == 150)
    val semi = Joins.customersWithBigOrders(c, o, 300000.0).count()
    val anti = Joins.customersWithoutBigOrders(c, o, 300000.0).count()
    assert(semi + anti == 150)
  }

  test("window top-N emits at most N per group and is dense from 1") {
    val t = Windows.topOrdersPerCustomer(Tables.orders(spark, sf), 3)
    val bad = t.groupBy("o_custkey").agg(count(lit(1)).as("k"), max("rn").as("mx"))
      .filter(col("k") > 3 || col("k") =!= col("mx")).count()
    assert(bad == 0)
  }

  test("running spend final value equals per-customer total") {
    val o = Tables.orders(spark, sf)
    val last = Windows.runningSpendPerCustomer(o)
      .groupBy("o_custkey").agg(max("running_spend").as("rs"))
    val tot = o.groupBy("o_custkey").agg(Num.sumMoney(col("o_totalprice")).as("tp"))
    assert(last.join(tot, "o_custkey").filter(col("rs") =!= col("tp")).count() == 0)
  }

  test("union counts = |customer| + |supplier|; intersect ⊆ both") {
    val c = Tables.customer(spark, sf); val s = Tables.supplier(spark, sf)
    assert(SetOps.nationKeyCounts(c, s).agg(sum("cnt")).first().getLong(0) == 150 + 10)
    val both = SetOps.nationsWithBoth(c, s)
    assert(both.count() <= 25)
  }

  test("salted join is semantically identical to the plain join") {
    val li = Tables.lineitem(spark, sf); val p = Tables.part(spark, sf)
    val plain = Joins.brandVolume(li, p).collect().map(_.toSeq).toSeq
    val salted = SparkEntry.queries("q25_salted_join")(spark, sf).collect().map(_.toSeq).toSeq
    assert(plain == salted)
  }

  test("rollup has subtotal and grand-total rows") {
    val r = Rollups.ordersRollup(Tables.orders(spark, sf))
    assert(r.filter(col("o_orderstatus").isNull && col("o_orderpriority").isNull).count() == 1)
    val grand = r.filter(col("o_orderstatus").isNull).agg(max("n_orders")).first().getLong(0)
    assert(grand == 1500)
  }
}

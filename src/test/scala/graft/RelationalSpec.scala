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

  test("pivot cells sum to the unpivoted total; unpivot is 3 rows per flag") {
    val o = Tables.orders(spark, sf)
    val p = Rollups.priorityStatusPivot(o)
    assert(p.count() == 5)
    val cells = p.select(
      (coalesce(col("sum_f"), lit(0.0)) + coalesce(col("sum_o"), lit(0.0)) +
        coalesce(col("sum_p"), lit(0.0))).as("t"))
      .agg(round(sum("t"), 2)).first().getDouble(0)
    val total = o.agg(round(Num.sumMoney(col("o_totalprice")), 2)).first().getDouble(0)
    assert(cells == total)

    val li = Tables.lineitem(spark, sf)
    val long = Rollups.returnflagMetricsLong(li)
    val flags = li.select("l_returnflag").distinct().count()
    assert(long.count() == 3 * flags)
    assert(long.select("metric").distinct().count() == 3)
  }

  test("full outer keeps buckets unique to either side, nulls on the other") {
    val j = Joins.acctbalBucketFullJoin(Tables.customer(spark, sf), Tables.supplier(spark, sf))
    // buckets form a superset of each side's bucket set
    val cOnly = j.filter(col("n_supp").isNull).count()
    val sOnly = j.filter(col("n_cust").isNull).count()
    assert(cOnly + sOnly > 0, "expected at least one one-sided bucket at the tails")
    assert(j.filter(col("n_cust").isNull && col("n_supp").isNull).count() == 0)
    assert(j.select("bucket").distinct().count() == j.count())
  }

  test("bloom-prefiltered join is semantically identical to the plain join") {
    val li = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val bloomed = Joins.bloomPrefilteredJoin(li, urgent, "l_orderkey", "o_orderkey", 100000)
      .agg(count(lit(1)), round(Num.sumMoney(col("l_extendedprice")), 2)).first()
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), round(Num.sumMoney(col("l_extendedprice")), 2)).first()
    assert(bloomed == plain)
    // and the prefilter really drops rows before the join at fpp=0.01
    val bloom = urgent.stat.bloomFilter("o_orderkey", 100000, 0.01)
    val pred = org.apache.spark.sql.GraftBridge.column(
      graft.functions.BloomMightContainLong(
        org.apache.spark.sql.GraftBridge.expression(col("l_orderkey").cast("long")), bloom))
    val kept = li.filter(pred).count()
    assert(kept < li.count(), "bloom prefilter should drop non-matching rows")
    assert(kept >= plain.getLong(0), "bloom must never drop a matching row")
  }

  test("corr bounded, mode maximal, and HM <= GM <= AM per group") {
    val li = Tables.lineitem(spark, sf)
    val c = Rollups.quantityPriceCorr(li)
    assert(c.filter(abs(col("corr")) > 1.0).count() == 0)
    val modes = Rollups.quantityModes(li).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val counts = li.groupBy("l_returnflag", "l_quantity").count().collect()
    counts.foreach(r => assert(r.getLong(2) <= modes(r.getString(0))))
    val m = Rollups.priceMeans(li)
      .join(li.groupBy("l_returnflag").agg(avg("l_extendedprice").as("am")), "l_returnflag")
    assert(m.filter(col("harm_mean") > col("geo_mean") ||
      col("geo_mean") > col("am") + 0.001).count() == 0, "AM-GM-HM violated")
  }

  test("weighted sample tracks its keep-probability; nullsafe join keeps NULL row") {
    import spark.implicits._
    val many = (1L to 4000L).map(i => (i, "t", "en", "s", (i % 100) * 10))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // mean weight = mean(min(1, n_chars/1000)) over n_chars in {0,10,...,990}
    val kept = graft.ops.Sampling.weightedSample(many, "doc_id", "s1",
      col("n_chars") / lit(1000.0)).count()
    val expected = (0 until 100).map(k => math.min(1.0, k * 10 / 1000.0)).sum / 100 * 4000
    assert(math.abs(kept - expected) < 0.05 * 4000, s"kept $kept vs expected ~$expected")
    // zero weight keeps nothing; weight 1 keeps all
    assert(graft.ops.Sampling.weightedSample(many, "doc_id", "s1", lit(0.0)).count() == 0)
    assert(graft.ops.Sampling.weightedSample(many, "doc_id", "s1", lit(1.0)).count() == 4000)

    val ns = Joins.nullSafeLangCounts(Tables.documents(spark, sf)).collect()
    assert(ns.exists(_.isNullAt(0)), "NULL <=> NULL row must survive the join")
    assert(ns.map(_.getLong(1)).sum == 500 && ns.map(_.getLong(2)).sum == 500)
  }

  test("gap-filled months are contiguous and preserve the total") {
    val o = Tables.orders(spark, sf)
    val dense = Rollups.monthlyOrderCountsDense(o).collect()
    val idx = dense.map(r => r.getLong(0) * 12 + r.getLong(1) - 1)
    assert(idx.zip(idx.tail).forall { case (a, b) => b == a + 1 }, "spine must be contiguous")
    assert(dense.map(_.getLong(2)).sum == o.count())
  }

  test("bookends frame sees whole partition; shares sum to 1") {
    val o = Tables.orders(spark, sf)
    val b = Windows.orderBookends(o)
    // every row in a partition agrees on first/last
    val disagree = b.groupBy("o_custkey")
      .agg(countDistinct("first_price").as("nf"), countDistinct("last_price").as("nl"))
      .filter(col("nf") =!= 1 || col("nl") =!= 1).count()
    assert(disagree == 0)
    // second_price is null exactly for single-order customers
    val singles = o.groupBy("o_custkey").count().filter(col("count") === 1).count()
    assert(b.filter(col("second_price").isNull).count() == singles)
    val shareSum = Windows.revenueShares(o).agg(round(sum("share"), 4)).first().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 0.001, s"shares sum to $shareSum")
  }

  test("window tiles: ntile balanced within 1, pct_rank/cume bounds hold") {
    val t = Windows.customerBalanceTiles(Tables.customer(spark, sf))
    assert(t.filter(col("tile") < 1 || col("tile") > 4).count() == 0)
    assert(t.filter(col("pct_rank") < 0 || col("pct_rank") > 1).count() == 0)
    assert(t.filter(col("cume") <= 0 || col("cume") > 1).count() == 0)
    val spread = t.groupBy("c_mktsegment", "tile").count()
      .groupBy("c_mktsegment").agg((max("count") - min("count")).as("d"))
    assert(spread.filter(col("d") > 1).count() == 0)
  }
}

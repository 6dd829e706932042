package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Events operators: invariants on sf0.001 + a brute-force as-of oracle. */
class EventOpsSpec extends AnyFunSuite {
  import TestSpark._
  lazy val ev = Tables.events(spark, sf).cache()

  test("bucket counts partition all events") {
    assert(EventOps.bucketCounts(ev).agg(sum("cnt")).first().getLong(0) == 1000)
  }

  test("sessionize: n_sessions in [1, n_events]") {
    val bad = EventOps.sessionize(ev, 30)
      .filter(col("n_sessions") < 1 || col("n_sessions") > col("n_events")).count()
    assert(bad == 0)
  }

  test("asof join matches brute-force per-row max") {
    val got = EventOps.purchaseAsofClick(ev).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000))
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).sorted) }
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").collect()
    purchases.foreach { r =>
      val (eid, u, tsn) = (r.getLong(0), r.getLong(1), r.getLong(2) / 1000)
      val expected = clicks.get(u).flatMap(c => c.takeWhile(_ <= tsn).lastOption)
      assert(got(eid) == expected, s"event $eid")
    }
  }

  test("pivot row sums equal cohort totals") {
    val p = EventOps.cohortTypePivot(ev)
    val rowSum = p.select((EventOps.EventTypes.map(col).reduce(_ + _)).as("s"), col("cohort"))
    val direct = ev.groupBy((col("user_id") % 10).as("cohort")).agg(count(lit(1)).as("n"))
    assert(rowSum.join(direct, "cohort").filter(col("s") =!= col("n")).count() == 0)
  }

  test("value bands cover every event exactly once") {
    assert(EventOps.valueBands(ev).agg(sum("cnt")).first().getLong(0) == 1000)
  }

  test("json props parse: every row has k") {
    assert(EventOps.propsKeySum(ev).agg(sum("n_k")).first().getLong(0) == 1000)
  }

  test("funnel: subsequence order matters; out-of-order stages don't count") {
    import spark.implicits._
    // user 1: view→click→purchase in order (stage 3)
    // user 2: purchase BEFORE view→click (stage 2 — purchase must follow)
    // user 3: click only, no view (stage 0 — click needs a preceding view)
    val rows = Seq(
      (1L, 1L, "view", 1000L), (2L, 1L, "click", 2000L), (3L, 1L, "purchase", 3000L),
      (4L, 2L, "purchase", 1000L), (5L, 2L, "view", 2000L), (6L, 2L, "click", 3000L),
      (7L, 3L, "click", 1000L)
    ).toDF("event_id", "user_id", "event_type", "tsn")
      .withColumn("ts", col("tsn") * 1000000L).drop("tsn") // fake nanos
    val got = EventOps.funnel(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(1L) === ((1L, 1L, 1L, 3L)))
    assert(got(2L) === ((1L, 1L, 0L, 2L)))
    assert(got(3L) === ((0L, 0L, 0L, 0L)))
  }

  test("activity islands: consecutive days merge, gaps split, dups collapse") {
    import spark.implicits._
    val day = 86400000000000L // nanos per day
    // user 1: days 0,1,2 (one island), then 5,6 (second island)
    // user 2: day 10 twice (one 1-day island — distinct collapses dups)
    val rows = Seq(
      (1L, 0L * day), (2L, 1L * day), (3L, 2L * day + 5000000000L),
      (4L, 5L * day), (5L, 6L * day),
      (6L, 10L * day), (7L, 10L * day + 1L)
    ).map { case (id, ts) => (id, if (id <= 5L) 1L else 2L, ts) }
      .toDF("event_id", "user_id", "ts")
    val got = EventOps.activityIslands(rows).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDate(2).toString, r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "1970-01-01", "1970-01-03", 3L),
      (1L, "1970-01-06", "1970-01-07", 2L),
      (2L, "1970-01-11", "1970-01-11", 1L)))
  }

  test("basket pairs bounded by min type audience; rfm tiles in 1..4") {
    val pairs = EventOps.eventTypePairs(ev).collect()
    val audience = ev.select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    pairs.foreach { r =>
      val n = r.getLong(2)
      assert(n <= math.min(audience(r.getString(0)), audience(r.getString(1))))
    }
    val rfm = EventOps.rfmSegments(ev)
    assert(rfm.filter(col("r_tile") < 1 || col("r_tile") > 4 ||
      col("f_tile") < 1 || col("f_tile") > 4 ||
      col("m_tile") < 1 || col("m_tile") > 4).count() == 0)
    // quartile cuts leave every band nonempty on continuous-ish metrics
    assert(rfm.select("m_tile").distinct().count() == 4)
  }

  test("cumulative users: monotone, ends at |users|, n_new sums to it") {
    val c = EventOps.cumulativeUniqueUsers(ev).collect()
    val cums = c.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a }, "must be monotone")
    val users = ev.select("user_id").distinct().count()
    assert(cums.last == users)
    assert(c.map(_.getLong(1)).sum == users)
  }

  test("retention cohorts: offset 0 equals cohort size; counts never exceed it") {
    val r = EventOps.retentionCohorts(ev).cache()
    val size0 = r.filter(col("offset_wk") === 0)
      .select(col("cohort_wk"), col("n_users").as("c0"))
    // every cohort has an offset-0 row and no offset exceeds its size
    val joined = r.join(size0, "cohort_wk")
    assert(joined.count() == r.count(), "cohort missing its offset-0 row")
    assert(joined.filter(col("n_users") > col("c0")).count() == 0)
    // total cohort sizes = distinct users
    val users = ev.select("user_id").distinct().count()
    assert(size0.agg(sum("c0")).first().getLong(0) == users)
  }

  test("top paths: pinned 3-step windows, deterministic tie cut") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts0.getTime + s * 1000L)
    // user 1: a b c a b c  → abc:2, bca:1, cab:1; user 2: a b c → abc:1
    val events = Seq(
      (1L, t(0), 1L, "a"), (1L, t(1), 2L, "b"), (1L, t(2), 3L, "c"),
      (1L, t(3), 4L, "a"), (1L, t(4), 5L, "b"), (1L, t(5), 6L, "c"),
      (2L, t(0), 7L, "a"), (2L, t(1), 8L, "b"), (2L, t(2), 9L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val all = EventOps.topPaths(events, 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(all.toList == List(
      ("a", "b", "c", 3L), ("b", "c", "a", 1L), ("c", "a", "b", 1L)))
    // k cuts after the (cnt desc, path asc) order
    val top1 = EventOps.topPaths(events, 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(top1.toList == List(("a", "b", "c", 3L)))
  }
}

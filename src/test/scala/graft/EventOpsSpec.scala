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
}

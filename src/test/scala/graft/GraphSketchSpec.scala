package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.PageRank
import graft.text.CountMin
import graft.ops.{EventOps, Rollups, Tables}

/** Round-4 batch-3 operators: integer PageRank (hand-computed fixpoint
  * prefix), Count-Min sketch invariants, closed-form OLS, and the
  * Markov transition matrix. Value-level grading is the DuckDB oracle
  * (q153–q156); these pin the semantics the oracle can't state —
  * one-sided CMS error, hand-derived PageRank rounds, perfect-fit
  * regression recovery. */
class GraphSketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("PageRank: two hand-computed damping rounds on the 3-node path") {
    // path a(1)-b(2)-c(3), symmetrized; degrees 1/2/1
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = PageRank.pageRank(edges, 2).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    // round 1: r(a)=r(c)=150000+85%·500000=575000; r(b)=150000+85%·2000000=1850000
    // round 2: r(a)=r(c)=150000+floor(85·925000/100)=936250
    //          r(b)=150000+floor(85·1150000/100)=1127500
    assert(r == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("personalized PageRank: two hand-computed seeded rounds on the 3-node path") {
    // path 1-2-3 symmetrized, seed {1}: teleport mass only lands on 1
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r = PageRank.personalizedPageRank(edges, Seq(1L).toDF("id"), 2).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    // r0 = (1e6, 0, 0)
    // round 1: r(1)=150000, r(2)=85%·1e6=850000, r(3)=0
    // round 2: r(1)=150000+floor(85·425000/100)=511250
    //          r(2)=floor(85·150000/100)=127500, r(3)=361250
    assert(r == Map(1L -> 511250L, 2L -> 127500L, 3L -> 361250L))
  }

  test("personalized PageRank: disconnected component scores zero, seeds outside graph inert") {
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val r = PageRank.personalizedPageRank(edges, Seq(1L, 99L).toDF("id"), 4).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(r(10L) == 0L && r(11L) == 0L, "unreachable component must stay 0")
    assert(r(1L) > 0L && r(2L) > 0L)
    assert(!r.contains(99L), "seed absent from the graph is not a vertex")
  }

  test("burstiness: hand-checked Fano; single-day types filtered; constant series -> 0") {
    val ts0 = 0L
    def t(day: Int, i: Int) = day * 86400000000000L + i * 1000000L + ts0
    // type a: day0 cnt 2, day1 cnt 4 -> n=2 s1=6 s2=20, fano=(2/1)/3
    // type b: one active day -> filtered; type c: 3,3 -> fano 0
    val events = (
      Seq((1L, t(0, 1), 1L, "a"), (2L, t(0, 2), 2L, "a"),
        (3L, t(1, 1), 3L, "a"), (4L, t(1, 2), 4L, "a"),
        (5L, t(1, 3), 5L, "a"), (6L, t(1, 4), 6L, "a")) ++
      Seq((7L, t(0, 1), 7L, "b")) ++
      (1 to 3).map(i => (8L, t(0, i), 10L + i, "c")) ++
      (1 to 3).map(i => (9L, t(1, i), 20L + i, "c")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.EventOps.burstiness(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Double]("fano"))).toMap
    assert(got.keySet == Set("a", "c"))
    assert(got("a")._1 == 2L && got("a")._2 == 6L && got("a")._3 == 20L)
    val expected = ((20.0 - 6.0 * 6L / 2L) / 1.0) / (6.0 / 2.0)
    assert(got("a")._4 == expected)
    assert(got("c")._4 == 0.0)
  }

  test("PageRank: disconnected pairs keep identical symmetric ranks") {
    val edges = Seq((10L, 11L), (11L, 10L), (20L, 21L), (21L, 20L)).toDF("src", "dst")
    val r = PageRank.pageRank(edges, 5).collect().map(_.getLong(1)).distinct
    // every vertex of a symmetric 2-clique has the same closed orbit
    assert(r.length == 1)
  }

  test("CMS estimates are one-sided (est >= exact) and exact in total") {
    val docs = Tables.documents(spark, sf)
    val est = CountMin.estimates(docs).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"undercount for ${r.getAs[String]("token")}")
      assert(r.getAs[Long]("overcount") == r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
    // each sketch row partitions the stream: row mass == total token count
    val total = CountMin.tokenCounts(docs).agg(sum("cnt")).as[Long].head()
    val rowMass = CountMin.sketch(docs).groupBy(col("row"))
      .agg(sum(col("counter")).as("mass")).select("mass").as[Long].collect()
    assert(rowMass.length == CountMin.Depth && rowMass.forall(_ == total))
  }

  test("OLS recovers a perfect linear relation exactly") {
    val df = (1 to 50).map(i => ("g", i.toDouble, 2.0 * i + 1.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val r = Rollups.quantityPriceRegression(df).collect().head
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("transition matrix: counts and floor'd probabilities on a pinned stream") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts0.getTime + s * 1000L)
    // user 1: a b a b; user 2: a a  → a->b:2 a->a:1 b->a:1
    val events = Seq(
      (1L, t(0), 1L, "a"), (1L, t(1), 2L, "b"), (1L, t(2), 3L, "a"), (1L, t(3), 4L, "b"),
      (2L, t(0), 5L, "a"), (2L, t(1), 6L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val m = EventOps.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m == Map(
      ("a", "a") -> ((1L, 3L, 333333L)),
      ("a", "b") -> ((2L, 3L, 666666L)),
      ("b", "a") -> ((1L, 1L, 1000000L))))
  }
}

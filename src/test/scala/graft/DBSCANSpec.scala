package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.DBSCAN

/** Distributed DBSCAN vs the exact local reference implementation:
  * identical partitions (cluster membership as set-of-sets) and identical
  * noise, across layouts that cross grid-cell boundaries. */
class DBSCANSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def partitions(assign: Map[Long, Long]): (Set[Set[Long]], Set[Long]) = {
    val (noise, clustered) = assign.partition(_._2 == -1L)
    (clustered.groupBy(_._2).values.map(_.keySet.toSet).toSet, noise.keySet.toSet)
  }

  private def runBoth(pts: Seq[(Long, Double, Double)], eps: Double, minPts: Int) = {
    val df = pts.toDF("id", "x", "y")
    val dist = DBSCAN.run(df, eps, minPts).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val loc = DBSCAN.local(pts, eps, minPts)
    (partitions(dist), partitions(loc))
  }

  test("two blobs + noise, clusters spanning cell boundaries") {
    val blob1 = (0 until 20).map(i => (i.toLong, 0.95 + (i % 5) * 0.04, 1.98 + (i / 5) * 0.04))
    val blob2 = (0 until 15).map(i => (100L + i, 5.0 + (i % 4) * 0.05, -3.0 + (i / 4) * 0.05))
    val noise = Seq((900L, 50.0, 50.0), (901L, -20.0, 10.0))
    val ((dc, dn), (lc, ln)) = runBoth(blob1 ++ blob2 ++ noise, 0.15, 4)
    assert(dc == lc, s"clusters differ: $dc vs $lc")
    assert(dn == ln)
    assert(dc.size == 2)
  }

  test("all noise when eps tiny") {
    val pts = (0 until 30).map(i => (i.toLong, i * 10.0, i * 7.0))
    val ((dc, dn), (lc, ln)) = runBoth(pts, 0.001, 3)
    assert(dc.isEmpty && dn == pts.map(_._1).toSet)
    assert(lc.isEmpty && ln == dn)
  }

  test("single dense cluster: everything cores into one component") {
    val pts = (0 until 25).map(i => (i.toLong, (i % 5) * 0.01, (i / 5) * 0.01))
    val ((dc, dn), (lc, ln)) = runBoth(pts, 0.05, 5)
    assert(dc == lc && dc.size == 1 && dn.isEmpty)
  }

  test("chain cluster across many cells (transitive connectivity)") {
    // points spaced 0.9*eps in a line: all density-reachable as one cluster
    val pts = (0 until 40).map(i => (i.toLong, i * 0.09, 0.0))
    val ((dc, dn), (lc, ln)) = runBoth(pts, 0.1, 3)
    assert(dc == lc, s"chain clusters differ")
    assert(dc.size == 1, s"expected one chain cluster, got ${dc.size}")
  }

  test("latLonToLocalXY projects km-scale distances") {
    val df = Seq((1L, 49.28, -123.12), (2L, 49.89, -119.50)).toDF("id", "lat", "lon")
    val xy = DBSCAN.latLonToLocalXY(df, "lat", "lon").collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("x"), r.getAs[Double]("y"))).toMap
    val dx = xy(1L)._1 - xy(2L)._1; val dy = xy(1L)._2 - xy(2L)._2
    val dist = math.sqrt(dx * dx + dy * dy)
    assert(math.abs(dist - 272) < 8, s"projected distance $dist km")
  }

  test("runND with 2 dims matches the 2D implementation") {
    val pts = (0 until 30).map(i => (i.toLong, (i % 6) * 0.04, (i / 6) * 0.04)) ++
      Seq((200L, 9.0, 9.0))
    val df = pts.toDF("id", "x", "y")
    val d2 = DBSCAN.run(df, 0.1, 4).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val dn = DBSCAN.runND(df, Seq("x", "y"), 0.1, 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cluster")).toMap
    assert(partitions(d2) == partitions(dn))
  }

  test("coords+severity variant stratifies clusters by severity (reference semantics)") {
    // one tight geographic blob, half MINOR (1.0) half MAJOR (3.0):
    // severity distance 2.0 >> eps, so two clusters must emerge
    val rows = (0 until 10).map(i =>
      (i.toLong, 49.0 + (i % 5) * 1e-4, -123.0 + (i / 5) * 1e-4, if (i < 5) 1.0 else 3.0))
    val df = rows.toDF("id", "lat", "lon", "sev")
    val out = DBSCAN.severityCoordsDbscan(df, "lat", "lon", "sev", epsKm = 25.0, minPts = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster")).toMap
    val minorClusters = (0 until 5).map(i => out(i.toLong)).toSet
    val majorClusters = (5 until 10).map(i => out(i.toLong)).toSet
    assert(minorClusters.size == 1 && majorClusters.size == 1)
    assert(minorClusters != majorClusters, "severities must not co-cluster")
    // oracle cross-check in 3D
    val local = DBSCAN.localND(rows.map { case (id, la, lo, s) =>
      (id, Seq(math.toRadians(la), math.toRadians(lo), s)) },
      25.0 / graft.ops.Geo.EarthRadiusKm, 3)
    assert(partitions(out) == partitions(local))
  }

  test("distributed DBSCAN on real embedding projection is stable") {
    val pts = graft.ops.Tables.embeddings(spark, sf).select(
      col("vec_id").as("id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))
    val local = DBSCAN.local(
      pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq, 0.02, 4)
    val dist = DBSCAN.run(pts, 0.02, 4).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(partitions(dist) == partitions(local))
  }

  test("radiusPairs: grid candidate generation is lossless vs brute force") {
    // adversarial placements: pairs straddling cell boundaries, a pair
    // at distance EXACTLY r (inclusive), a pair just over r, and
    // negative coordinates (floor-division cells, not truncation)
    val r = 1.0
    val pts = Seq(
      (1L, 0.95, 0.0), (2L, 1.05, 0.0),   // straddle x-cell boundary, d=0.1
      (3L, 3.0, 3.0), (4L, 3.0, 4.0),     // d = exactly r → included
      (5L, 6.0, 0.0), (6L, 6.0, 1.001),   // just over r → excluded
      (7L, -0.5, -0.5), (8L, -1.4, -0.5), // negative coords, d=0.9
      (9L, 10.0, 10.0)                    // isolated
    ).toDF("id", "x", "y")
    val got = graft.ops.Geo.radiusPairs(pts, r).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1))).toSet
    val raw = pts.collect().map(rw => (rw.getLong(0), rw.getDouble(1), rw.getDouble(2)))
    val brute = (for {
      a <- raw; b <- raw if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1)).toSet
    assert(got == brute, s"grid join diverged: got $got, brute $brute")
    assert(got.contains((3L, 4L)), "boundary pair at d == r must be included")
    assert(!got.contains((5L, 6L)), "pair just over r must be excluded")
  }
}

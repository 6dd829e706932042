package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.ConnectedComponents

/** DataFrame-native alternating-star CC vs (a) a local union-find oracle
  * and (b) GraphX connectedComponents, on structured and random graphs.
  * Labels must be the component MINIMUM id (deterministic set property). */
class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Local union-find with min-id canonical labels. */
  private def oracle(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // path-compress to true min per component
    val byRoot = vertices.groupBy(find)
    byRoot.flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }.toMap
  }

  private def run(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val v = vertices.toDF("id")
    val e = edges.toDF("src", "dst")
    ConnectedComponents.components(v, e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, star, cycle, isolated vertices") {
    val vertices = (0L to 20L)
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),            // chain 0-4
      (10L, 11L), (10L, 12L), (10L, 13L),                // star at 10
      (15L, 16L), (16L, 17L), (17L, 15L))                // cycle 15-17
    val got = run(vertices, edges)
    assert(got === oracle(vertices, edges))
    assert(got(4L) === 0L && got(13L) === 10L && got(17L) === 15L)
    assert(got(20L) === 20L) // isolated
  }

  test("single component long path (diameter >> log n)") {
    val n = 200L
    val vertices = 0L until n
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val got = run(vertices, edges)
    assert(got.values.toSet === Set(0L))
  }

  test("duplicate + reversed + self-loop edges are harmless") {
    val vertices = Seq(1L, 2L, 3L, 4L)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 1L), (3L, 3L), (2L, 4L))
    val got = run(vertices, edges)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L))
  }

  test("empty edge set: every vertex is its own component") {
    val got = run(Seq(5L, 7L, 9L), Seq.empty)
    assert(got === Map(5L -> 5L, 7L -> 7L, 9L -> 9L))
  }

  test("hybrid driver finish is bit-identical to the pure distributed contraction") {
    val rnd = new scala.util.Random(7)
    val ids = (0L until 300L)
    val edges = (0 until 500).map(_ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
    val e = edges.toDF("src", "dst")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hybrid = asMap(ConnectedComponents.contract(e)) // bound ≫ 500 ⇒ local finish
    val distributed = asMap(ConnectedComponents.contract(e, driverEdgeBound = 0L))
    assert(hybrid === distributed)
    assert(hybrid === asMap(ConnectedComponents.contract(e)), "deterministic")
  }

  test("random graphs match union-find oracle and GraphX") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(70)
      val ids = (0 until n).map(_ => rnd.nextLong().abs % 100000)
        .distinct.map(_.toLong)
      val edges = (0 until n * 2).map { _ =>
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size)))
      }
      val got = run(ids, edges)
      assert(got === oracle(ids, edges), s"trial $trial vs union-find")
      // cross-check vs GraphX on the same graph
      val sc = spark.sparkContext
      val vRdd = sc.parallelize(ids.map(id => (id, ())))
      val eRdd = sc.parallelize(
        edges.filter { case (a, b) => a != b }
          .map { case (a, b) => org.apache.spark.graphx.Edge(a, b, ()) })
      val gx = org.apache.spark.graphx.Graph(vRdd, eRdd)
        .connectedComponents().vertices.collect().toMap
      assert(got === gx, s"trial $trial vs GraphX")
    }
  }
}

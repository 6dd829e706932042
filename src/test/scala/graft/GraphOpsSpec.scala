package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cluster.Graphs

/** Round-4 batch-4 graph analytics: triangle counts vs a local
  * brute-force triple enumeration, k-core peel vs hand-worked examples
  * (plus the convergence no-op check the fixed-round API relies on),
  * and truncated multi-source BFS vs a local Dijkstra-on-unit-weights.
  * Value-level grading on the real similarity graph is the DuckDB
  * oracle (q158–q160); these pin semantics on adversarial shapes the
  * corpus may not produce (cliques, stars, disconnected seeds). */
class GraphOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def pairsDF(pairs: Seq[(Long, Long)]) = pairs.toDF("doc_a", "doc_b")

  private def triangles(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.triangleCounts(pairsDF(pairs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle counts: K4 gives 3 per vertex, pendant edges give none") {
    // K4 on 1..4 (every vertex in C(3,2)=3 triangles) plus pendant 4-5
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(triangles(k4 :+ (4L -> 5L)) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts: stars and paths are triangle-free") {
    val star = (2L to 8L).map(i => (1L, i))
    assert(triangles(star).isEmpty)
    val path = (1L to 7L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(triangles(path).isEmpty)
  }

  test("triangle counts match brute-force triple enumeration on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.2
    } yield (a, b)).toSeq
    val eset = edges.toSet
    val expected = (for {
      a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
      if eset((a, b)) && eset((b, c)) && eset((a, c))
      v <- Seq(a, b, c)
    } yield v).groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    assert(triangles(edges) == expected)
  }

  test("k-core: pendant chain peels off, the clique core survives with inner degrees") {
    // triangle 1-2-3 with a tail 3-4-5: 2-core = the triangle, deg 2 each
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val core = Graphs.kCore(pairsDF(g), 2, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // a 3-core demand wipes the graph entirely
    assert(Graphs.kCore(pairsDF(g), 3, 3).collect().isEmpty)
  }

  test("k-core: a further round is a no-op once converged (cascade depth 3)") {
    // chain 1-2-3-4-5 + triangle 5-6-7: peeling cascades down the chain
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L))
    val r4 = Graphs.kCore(pairsDF(g), 2, 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r5 = Graphs.kCore(pairsDF(g), 2, 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r4 == r5)
    assert(r4 == Set((5L, 2L), (6L, 2L), (7L, 2L)))
  }

  test("BFS hops: exact truncated distances, unreachable and beyond-horizon absent") {
    // path 1-2-3-4-5-6 plus isolated edge 10-11; seeds {1, 10}
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (10L, 11L))
    val seeds = Seq(1L, 10L).toDF("id")
    val d = Graphs.bfsHops(pairsDF(g), seeds, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      10L -> 0L, 11L -> 1L))
  }

  test("label propagation: disjoint triangles converge to their min id") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L))
    val labs = Graphs.labelPropagation(pairsDF(g), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("label propagation: labels never cross components; result is deterministic") {
    val rnd = new scala.util.Random(3)
    // two random blobs on disjoint id ranges plus internal density
    val blob1 = for { a <- 0L to 15L; b <- (a + 1) to 15L if rnd.nextDouble() < 0.4 } yield (a, b)
    val blob2 = for { a <- 100L to 115L; b <- (a + 1) to 115L if rnd.nextDouble() < 0.4 } yield (a, b)
    val g = pairsDF((blob1 ++ blob2).toSeq)
    val r1 = Graphs.labelPropagation(g, 3).collect().map(r => (r.getLong(0), r.getLong(1)))
    val r2 = Graphs.labelPropagation(g, 3).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r1.toSeq == r2.toSeq, "fixed-round LPA must be deterministic")
    r1.foreach { case (id, lab) =>
      assert((id < 100) == (lab < 100), s"label $lab crossed components to $id")
    }
  }

  test("BFS hops: multi-source takes the minimum over seeds") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val d = Graphs.bfsHops(pairsDF(g), Seq(1L, 5L).toDF("id"), 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  private def edgesDF(edges: Seq[(Long, Long)]) = edges.toDF("src", "dst")

  private def scc(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Graphs.stronglyConnected(edgesDF(edges)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Brute SCC oracle: Warshall closure, scc_id = min mutual partner. */
  private def sccBrute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val reach = collection.mutable.Set[(Long, Long)]() ++ edges
    var changed = true
    while (changed) {
      changed = false
      for ((a, b) <- reach.toSeq; c <- nodes if reach((b, c)) && !reach((a, c))) {
        reach += ((a, c)); changed = true
      }
    }
    nodes.map { n =>
      n -> (n +: nodes.filter(m => reach((n, m)) && reach((m, n)))).min
    }.toMap
  }

  test("SCC: directed cycle collapses, DAG chain stays singleton") {
    // cycle 1→2→3→1, chain 3→10→11, mutual pair 20↔21
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 10L), (10L, 11L),
      (20L, 21L), (21L, 20L))
    val r = scc(g)
    assert(r == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      10L -> (10L, 1L), 11L -> (11L, 1L),
      20L -> (20L, 2L), 21L -> (20L, 2L)))
  }

  test("SCC: peel count is bounded by condensation depth + 1 (chain of cycles)") {
    // the StressBench scc_deep law, certified exactly: a chain of
    // `depth` 3-cycles has condensation depth `depth`; maxPeels =
    // depth + 1 must SUFFICE (stronglyConnected throws past the
    // bound), and each cycle settles as its own 3-member SCC
    val depth = 6
    val g = (0 until depth).flatMap { c =>
      val b = 3L * c
      Seq((b, b + 1), (b + 1, b + 2), (b + 2, b)) ++
        (if (c < depth - 1) Seq((b + 2L) -> (b + 3L)) else Nil)
    }
    val out = Graphs.stronglyConnected(edgesDF(g),
      maxPeels = depth + 1, driverEdgeBound = 0L).collect()
    assert(out.length == 3 * depth)
    assert(out.forall(_.getLong(2) == 3L), "every chain cycle is a 3-member SCC")
    val lvl = Graphs.condensationLevels(edgesDF(g), driverBound = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lvl == (0 until depth).map(c => 3L * c -> c.toLong).toMap,
      "condensation level = chain position")
  }

  test("SCC: one-way containment cascade never merges; back edge fuses it") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(scc(chain).values.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    val fused = scc(chain :+ (4L -> 1L))
    assert(fused.values.toSet == Set((1L, 4L)))
  }

  test("SCC: random digraphs match the closure oracle") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val g = (for {
        a <- 0L until n
        b <- 0L until n
        if a != b && rnd.nextDouble() < 0.12
      } yield (a, b)).toSeq
      val got = scc(g).map { case (id, (sid, _)) => id -> sid }
      assert(got == sccBrute(g), s"trial $trial mismatch")
      // sizes consistent with the id assignment
      val sizes = scc(g).groupBy(_._2._1).map { case (sid, ms) => sid -> ms.size.toLong }
      scc(g).foreach { case (_, (sid, sz)) => assert(sz == sizes(sid)) }
    }
  }

  test("SCC hybrid driver finish is bit-identical to the distributed peeling") {
    val rnd = new scala.util.Random(23)
    val g = (for {
      a <- 0L until 20L
      b <- 0L until 20L
      if a != b && rnd.nextDouble() < 0.15
    } yield (a, b)).toSeq
    // hybrid finish is an explicit opt-in; the default (bound 0) is the
    // pure-distributed path with no per-peel count action
    val local = Graphs.stronglyConnected(edgesDF(g), driverEdgeBound = 2000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val dist = Graphs.stronglyConnected(edgesDF(g)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(local == dist)
    val lvlLocal = Graphs.condensationLevels(edgesDF(g), driverBound = 2000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val lvlDist = Graphs.condensationLevels(edgesDF(g)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(lvlLocal == lvlDist)
  }

  test("SCC: empty edge set yields an empty result") {
    assert(scc(Seq.empty).isEmpty)
  }

  private def levels(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Graphs.condensationLevels(edgesDF(edges)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("condensation levels: cycle chain counts SCC hops, not vertex hops") {
    // {1,2} ↔, bridge to {3,4} ↔, bridge to singleton 10
    val g = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L), (4L, 10L))
    assert(levels(g) == Map(1L -> (0L, 2L), 3L -> (1L, 2L), 10L -> (2L, 1L)))
  }

  test("condensation levels: diamond takes the LONGEST incoming path") {
    // a→b→d and a→c→d→e: d's level is 2 via either arm, e is 3
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    assert(levels(g) == Map(1L -> (0L, 1L), 2L -> (1L, 1L), 3L -> (1L, 1L),
      4L -> (2L, 1L), 5L -> (3L, 1L)))
  }

  test("condensation levels: random digraphs match a brute longest-path oracle") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 14 + trial * 4
      val g = (for {
        a <- 0L until n
        b <- 0L until n
        if a != b && rnd.nextDouble() < 0.10
      } yield (a, b)).toSeq
      if (g.nonEmpty) {
        val sid = sccBrute(g)
        val cedges = g.map { case (a, b) => (sid(a), sid(b)) }
          .filter { case (x, y) => x != y }.distinct
        // brute longest path per condensation node (memoized DFS; acyclic)
        val memo = collection.mutable.Map[Long, Long]()
        def lvl(v: Long): Long = memo.getOrElseUpdate(v,
          cedges.filter(_._2 == v).map(e => lvl(e._1) + 1) match {
            case Nil => 0L
            case ls  => ls.max
          })
        val expect = sid.values.toSeq.distinct
          .map(s => s -> (lvl(s), sid.values.count(_ == s).toLong)).toMap
        assert(levels(g) == expect, s"trial $trial mismatch")
      }
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BoundedCache

/** The bounded session cache behind Quantize.encodeCache /
  * Eval.scoreCache: LRU size bound with onEvict, cross-app eviction,
  * and the explicit clear() invalidation hook. */
class BoundedCacheSpec extends AnyFunSuite {

  test("LRU evicts the least-recently-used entry past maxEntries, running onEvict") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new BoundedCache[Int, String](maxEntries = 2, onEvict = evicted += _)
    c.getOrCompute("app", 1)("v1")
    c.getOrCompute("app", 2)("v2")
    assert(c.getOrCompute("app", 1)("MISS") == "v1") // touch 1 -> 2 is LRU
    c.getOrCompute("app", 3)("v3")
    assert(evicted.toSeq == Seq("v2"))
    assert(c.getOrCompute("app", 2)("v2b") == "v2b") // 2 recomputes
    assert(evicted.toSeq == Seq("v2", "v1"))
    assert(c.size == 2)
  }

  test("entries from other application ids are evicted on access") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new BoundedCache[Int, String](maxEntries = 8, onEvict = evicted += _)
    c.getOrCompute("app-old", 1)("stale")
    assert(c.getOrCompute("app-new", 1)("fresh") == "fresh")
    assert(evicted.toSeq == Seq("stale") && c.size == 1)
  }

  test("clear() is the invalidation hook: evicts everything, next access recomputes") {
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new BoundedCache[Int, String](maxEntries = 8, onEvict = evicted += _)
    c.getOrCompute("app", 1)("v1")
    c.getOrCompute("app", 2)("v2")
    c.clear()
    assert(evicted.toSet == Set("v1", "v2") && c.size == 0)
    assert(c.getOrCompute("app", 1)("v1b") == "v1b")
  }

  test("hit does not recompute") {
    var computes = 0
    val c = new BoundedCache[Int, String](maxEntries = 2, onEvict = _ => ())
    c.getOrCompute("app", 1) { computes += 1; "v" }
    c.getOrCompute("app", 1) { computes += 1; "v" }
    assert(computes == 1)
  }

  test("a failed compute is never cached: slot freed, retry runs the NEW closure") {
    val c = new BoundedCache[Int, String](maxEntries = 2, onEvict = _ => ())
    val e = intercept[RuntimeException] {
      c.getOrCompute("app", 1) { throw new RuntimeException("boom") }
    }
    assert(e.getMessage == "boom")
    assert(c.size == 0, "poisoned cell must not occupy an LRU slot")
    assert(c.getOrCompute("app", 1)("recovered") == "recovered",
      "retry must run the new caller's closure, not replay the failed one")
  }

  test("evict -> re-access recomputes a correct checkpoint end-to-end (Quantize encode)") {
    import TestSpark._
    import spark.implicits._
    def emb(seed: Long) = (1L to 4L)
      .map(i => (i, Array((seed + i).toFloat / 10f, (seed - i).toFloat / 10f)))
      .toDF("vec_id", "embedding")
    val first = graft.sim.Quantize.quantized(emb(0L)).collect().map(_.toSeq)
    // 9 further distinct plans overflow the 8-entry LRU -> plan 0 evicts
    (1L to 9L).foreach(s => graft.sim.Quantize.codes(emb(s)).count())
    val again = graft.sim.Quantize.quantized(emb(0L)).collect().map(_.toSeq)
    assert(again.toSeq == first.toSeq,
      "recomputed encode after eviction must be bit-identical")
  }

  test("GraftBridge.unpersistLocalCheckpoint frees the checkpoint's RDD blocks") {
    import TestSpark._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = spark.range(100).toDF("id").localCheckpoint()
    df.count()
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.nonEmpty, "localCheckpoint must pin RDD blocks")
    org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(df)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(pinned.forall(!after.contains(_)),
      s"checkpoint blocks still pinned after unpersist: ${pinned & after}")
  }
}

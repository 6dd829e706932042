package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Incremental, SetOps, Tables, Upsert}

/** Incremental maintenance: algebraic aggregate-state merge and the
  * changelog-generation/apply roundtrip. */
class IncrementalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("refresh(state(base), delta) == full recompute") {
    val base = docs.filter(col("doc_id") % 10 < 8)
    val delta = docs.filter(col("doc_id") % 10 >= 8)
    val keys = Seq("lang", "source")
    val inc = Incremental.refresh(
      Incremental.aggState(base, keys, "n_chars"), delta, keys, "n_chars")
    val full = Incremental.aggState(docs, keys, "n_chars")
      .withColumn("mean_v", round(col("sum_v").cast("double") / col("n"), 6))
      .orderBy(keys.map(col): _*)
    assert(inc.collect().toSeq === full.collect().toSeq)
  }

  test("mergeStates is associative and commutative") {
    val keys = Seq("lang")
    val s = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2)
    ).map(Incremental.aggState(_, keys, "n_chars"))
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("lang").collect().toSeq
    val abc = Incremental.mergeStates(Incremental.mergeStates(s(0), s(1), keys), s(2), keys)
    val cba = Incremental.mergeStates(s(2), Incremental.mergeStates(s(1), s(0), keys), keys)
    assert(sorted(abc) === sorted(cba))
    assert(sorted(abc) === sorted(Incremental.aggState(docs, keys, "n_chars")))
  }

  test("empty delta leaves the state unchanged (plus derived mean)") {
    val keys = Seq("lang")
    val state = Incremental.aggState(docs, keys, "n_chars")
    val out = Incremental.refresh(state, docs.limit(0), keys, "n_chars")
      .drop("mean_v").orderBy("lang")
    assert(out.collect().toSeq === state.orderBy("lang").collect().toSeq)
  }

  test("HLL distinct state: merged sketches == recompute, estimate near exact") {
    val keys = Seq("lang")
    val parts = Seq(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    val merged = graft.ops.Incremental.mergeDistinctStates(
      graft.ops.Incremental.distinctState(parts(0), keys, "source"),
      graft.ops.Incremental.distinctState(parts(1), keys, "source"), keys)
    val est = graft.ops.Incremental.distinctEstimate(merged, keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sketch-of-union == union-of-sketches, exactly
    val whole = graft.ops.Incremental.distinctEstimate(
        graft.ops.Incremental.distinctState(docs, keys, "source"), keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === whole)
    // and near the exact answer (tiny cardinalities → exact here)
    val exact = docs.groupBy("lang").agg(countDistinct("source").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)).toDouble / exact(k) <= 0.05, s"$k: $v vs ${exact(k)}")
    }
  }

  test("mad outlier fence: extremes out, bulk in, robust to the outliers themselves") {
    val base = (1L to 100L).map(i => (i, 100L + (i % 11))) // tight cluster 100..110
    val spiked = (base :+ (900L, 100000L) :+ (901L, -50000L)).toDF("doc_id", "n_chars")
    val kept = graft.quality.Filters.madOutliers(spiked, "n_chars", 3.0)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(900L) && !kept.contains(901L))
    assert(base.map(_._1).toSet.subsetOf(kept))
  }

  test("packSequences: slices tile packs exactly and reassemble each doc") {
    val seqLen = 7L
    val docsDf = Seq(
      (1L, "a b c d e"),          // 5 toks
      (2L, "f g h i j k l m n"),  // 9 toks: straddles
      (3L, "o p"),                // 2
      (4L, "q r s t u v w x y z a2 b2")) // 12
      .toDF("doc_id", "text")
    val rows = graft.text.TextOps.packSequences(docsDf, seqLen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = 5 + 9 + 2 + 12 // 28 tokens → packs 0..3
    // per-doc slices reassemble the doc contiguously
    for ((doc, slices) <- rows.groupBy(_._2)) {
      val ordered = slices.sortBy(_._4)
      assert(ordered.head._4 === 0L, s"doc $doc doesn't start at offset 0")
      assert(ordered.map(_._5).sum === ordered.last._4 + ordered.last._5)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 === b._4, s"doc $doc gap")
        case _ =>
      }
    }
    // packs tile: every pack except the last is exactly seqLen tokens,
    // slices within a pack are contiguous from offset 0
    val byPack = rows.groupBy(_._1).toSeq.sortBy(_._1)
    assert(byPack.map(_._1) === (0L until (total + seqLen - 1) / seqLen))
    for ((pack, slices) <- byPack) {
      val ordered = slices.sortBy(_._3)
      assert(ordered.head._3 === 0L)
      val len = ordered.map(_._5).sum
      if (pack < byPack.last._1) assert(len === seqLen, s"pack $pack not full")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 === b._3, s"pack $pack gap")
        case _ =>
      }
    }
  }

  test("changelog → apply roundtrip reproduces v2; deletes carried as D") {
    val v1 = docs.filter(col("doc_id") % 10 < 8)
    val v2 = docs.filter(col("doc_id") % 10 >= 2)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, upper(col("text"))).otherwise(col("text")))
    val cl = SetOps.changelog(v1, v2, "doc_id", "text", 7L)
    // ops present: U for added (8,9 buckets) + changed (%5==0), D for removed (0,1)
    val ops = cl.groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops.keySet === Set("U", "D") && ops("D") > 0 && ops("U") > 0)
    val applied = Upsert.applyChangelog(v1, cl, "doc_id", "seq", "op")
      .orderBy("doc_id").collect().toSeq
    assert(applied === v2.orderBy("doc_id").collect().toSeq)
    // unchanged rows generate no changelog records
    val unchangedIds = cl.select("doc_id").as[Long].collect().toSet
    val trulyUnchanged = docs.filter(col("doc_id") % 10 >= 2 &&
      col("doc_id") % 10 < 8 && col("doc_id") % 5 =!= 0)
      .select("doc_id").as[Long].collect().toSet
    assert(unchangedIds.intersect(trulyUnchanged).isEmpty)
  }
}

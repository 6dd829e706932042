package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Joins, Tables}
import graft.sim.{Fusion, Quantize, SparseSim}

/** Round-3 retrieval additions: interval-overlap join (lossless vs the
  * cross-product filter), sparse shingle-TF-IDF top-k, int8 scalar
  * quantization, and reciprocal rank fusion. */
class RetrievalOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("intervalOverlapPairs == cross-product filter on random intervals") {
    val rnd = new scala.util.Random(7)
    val iv = (0 until 300).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, (i % 7).toLong, s, s + rnd.nextInt(5000).toLong)
    }
    val df = iv.toDF("id", "key", "s", "e")
    val got = Joins.intervalOverlapPairs(df, 1000L)
      .select("key", "a_id", "b_id", "overlap").as[(Long, Long, Long, Long)]
      .collect().toSet
    val want = (for {
      a <- iv; b <- iv
      if a._2 == b._2 && a._1 < b._1 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._2, a._1, b._1, math.min(a._4, b._4) - math.max(a._3, b._3))).toSet
    assert(got === want)
    assert(got.forall(_._4 >= 0))
  }

  test("intervalOverlapPairs emits each pair exactly once across buckets") {
    // long intervals spanning many buckets still yield one row per pair
    val df = Seq((1L, 0L, 0L, 10000L), (2L, 0L, 500L, 9500L)).toDF("id", "key", "s", "e")
    val rows = Joins.intervalOverlapPairs(df, 100L).collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("overlap") === 9000L)
  }

  test("sparse top-k: exact duplicates rank each other first with sim 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma other words here entirely"),
      (4L, "completely different text about nothing shared")
    ).toDF("doc_id", "text")
    val top = SparseSim.shingleTfidfTopK(docs, 3, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val first = top.filter(t => t._1 == 1L && t._4 == 1L).head
    assert(first._2 === 2L && first._3 === 1.0)
    // doc 4 shares no shingle with anyone → no rows
    assert(!top.exists(t => t._1 == 4L || t._2 == 4L))
    // similarity is a valid cosine
    assert(top.forall(t => t._3 >= -1e-9 && t._3 <= 1.0 + 1e-9))
  }

  test("tfidf topk: long-overflow guard raises on pairs past the headroom") {
    import spark.implicits._
    // two long near-identical docs share hundreds of shingles; with the
    // headroom forced down to 10 the guard must fire (the natural bound
    // is unreachable at fixture scale — that's the point of the override)
    val longText = (1 to 300).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, longText), (2L, longText + " tail"),
      (3L, "unrelated filler words")).toDF("doc_id", "text")
    val sh = graft.dedup.Dedup.shingles(docs, 3).localCheckpoint()
    val ex = intercept[Exception] {
      SparseSim.shingleTfidfTopKFrom(sh, 3L, 2, headroomOverride = 10L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("exact-long headroom")))
    // and with the real bound the same input is fine
    val ok = SparseSim.shingleTfidfTopKFrom(sh, 3L, 2).collect()
    assert(ok.nonEmpty)
  }

  test("quantize: codes bounded, constant dims safe, error below step size") {
    val emb = Tables.embeddings(spark, sf)
    val q = Quantize.quantized(emb).collect()
    assert(q.length === emb.count())
    assert(q.forall { r =>
      r.getLong(2) >= 0L && r.getLong(3) <= 255L && r.getLong(2) <= r.getLong(3)
    })
    // max per-dim error is half a quantization step; L2 over d dims is
    // bounded by sqrt(d) * max_step/2 — loose sanity bound
    val extrema = Quantize.dimExtrema(emb, "embedding")
    val maxStep = extrema.map { case (lo, hi) => (hi - lo) / 255.0 }.max
    val bound = math.sqrt(extrema.length.toDouble) * maxStep
    assert(q.forall(_.getDouble(4) <= bound))
    // degenerate constant dimension encodes to 0 with zero error
    val const = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val qc = Quantize.quantized(const).collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(qc.forall(_._2 < 1e-6 + 0.5 * 1.0 / 255.0 * math.sqrt(2.0)))
  }

  test("rrf: consensus item outranks single-list items; k respected") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "item_id", "rn")
    val b = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "item_id", "rn")
    val fused = Fusion.rrf(Seq(a, b), 60, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(fused.length === 2) // k = 2
    // item 11 appears in both lists (ranks 2 and 1) → top fused
    assert(fused.head._2 === 11L && fused.head._4 === 1L)
    val s11 = 1.0 / 62 + 1.0 / 61
    assert(math.abs(fused.head._3 - BigDecimal(s11).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }
}

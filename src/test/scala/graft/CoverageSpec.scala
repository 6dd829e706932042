package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Coverage

/** FoF corpus statistics (q218/q219/q220): hand-computed exact values
  * on a tiny fixture plus a token-level brute-force replay of the
  * coverage law (proving the class-arithmetic shortcut equals the
  * greedy token prefix). Value-level gate at sf is the DuckDB oracle.
  */
class CoverageSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // counts: a:4 b:3 c:1 d:1 -> N=9 V=4, FoF {4:1, 3:1, 1:2}
  private lazy val docs = Seq(
    (1L, "a a a b b c"),
    (2L, "a b d")
  ).toDF("doc_id", "text")

  test("goodTuring: exact Good-Turing and bias-corrected Chao1") {
    val r = Coverage.goodTuring(docs).collect()
    assert(r.length == 1)
    val h = r.head
    assert(h.getAs[Long]("n_tokens") == 9L && h.getAs[Long]("vocab") == 4L)
    assert(h.getAs[Long]("n1") == 2L && h.getAs[Long]("n2") == 0L)
    assert(h.getAs[Long]("unseen_ppm") == 2L * 1000000L / 9L)
    // chao1 = V + n1(n1-1)/(2(n2+1)) = 4 + 2*1/2 = 5
    assert(h.getAs[Long]("chao1") == 5L)
  }

  test("simpsonDiversity: pair-collision arithmetic") {
    val h = Coverage.simpsonDiversity(docs).collect().head
    // sum_ff1 = 4*3 + 3*2 = 18; inv_simpson = 9*8/18 = 4
    assert(h.getAs[Long]("sum_ff1") == 18L)
    assert(h.getAs[Long]("inv_simpson") == 4L)
    assert(h.getAs[Long]("singleton_pm") == 500L)
  }

  test("simpsonDiversity: all-hapax corpus grades inv_simpson NULL") {
    val uniq = Seq((1L, "x y z")).toDF("doc_id", "text")
    val h = Coverage.simpsonDiversity(uniq).collect().head
    assert(h.getAs[Long]("sum_ff1") == 0L)
    assert(h.isNullAt(h.fieldIndex("inv_simpson")))
    assert(h.getAs[Long]("singleton_pm") == 1000L)
    // and Chao1 stays defined with n2 = 0 (bias-corrected form)
    val g = Coverage.goodTuring(uniq).collect().head
    assert(g.getAs[Long]("chao1") == 3L + 3L * 2L / 2L)
  }

  test("simpsonDiversity past-envelope auto-switch: lowered envelope routes " +
      "to double pair products, equal to the exact components re-rendered") {
    // the envelope-parameter seam forces the fallback through the PUBLIC
    // wiring on the tiny fixture; in the < 2^53 regime the double route
    // must reproduce the exact path's integers bit-for-bit
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val exact = Coverage.simpsonDiversity(docs).collect().head
    val forced = Coverage.simpsonDiversity(docs, envelope = 1L)
    val fs = forced.schema
    assert(fs("sum_ff1").dataType == DoubleType &&
      fs("inv_simpson").dataType == DoubleType,
      s"lowered envelope must route to the double rendering: $fs")
    val f = forced.collect().head
    // count columns stay exact BIGINT on BOTH routes
    assert(f.getAs[Long]("n_tokens") == exact.getAs[Long]("n_tokens"))
    assert(f.getAs[Long]("vocab") == exact.getAs[Long]("vocab"))
    assert(f.getAs[Long]("singleton_pm") == exact.getAs[Long]("singleton_pm"))
    // pair products: bit-equal to the exact integers rendered in double
    assert(f.getAs[Double]("sum_ff1") == exact.getAs[Long]("sum_ff1").toDouble)
    val nTok = exact.getAs[Long]("n_tokens")
    val expectInv = nTok.toDouble * (nTok - 1L).toDouble /
      exact.getAs[Long]("sum_ff1").toDouble
    assert(f.getAs[Double]("inv_simpson") == expectInv,
      s"double ratio ${f.getAs[Double]("inv_simpson")} != $expectInv")
    // and the default envelope stays on the exact BIGINT route
    val ds = Coverage.simpsonDiversity(docs).schema
    assert(ds("sum_ff1").dataType == LongType &&
      ds("inv_simpson").dataType == LongType,
      s"default envelope must stay exact: $ds")
  }

  test("simpsonDiversity double route: all-hapax corpus still grades " +
      "inv_simpson NULL") {
    val uniq = Seq((1L, "x y z")).toDF("doc_id", "text")
    val h = Coverage.simpsonDiversity(uniq, envelope = 1L).collect().head
    assert(h.getAs[Double]("sum_ff1") == 0.0d)
    assert(h.isNullAt(h.fieldIndex("inv_simpson")))
    assert(h.getAs[Long]("singleton_pm") == 1000L)
  }

  test("vocabCoverage equals the token-level greedy prefix (brute replay)") {
    val counts = Map("a" -> 4L, "b" -> 3L, "c" -> 1L, "d" -> 1L)
    val n = counts.values.sum
    val ordered = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    def brute(pct: Long): (Long, Long) = {
      val target = (pct * n + 99) / 100
      val prefix = ordered.scanLeft(0L)(_ + _._2).drop(1)
        .zipWithIndex.find(_._1 >= target).get
      (prefix._2 + 1L, prefix._1) // (v_needed, mass)
    }
    val got = Coverage.vocabCoverage(docs).collect()
      .map(r => r.getAs[Long]("pct") ->
        (r.getAs[Long]("v_needed"), r.getAs[Long]("mass"))).toMap
    assert(got.keySet == Set(50L, 90L, 99L))
    for (p <- Seq(50L, 90L, 99L))
      assert(got(p) == brute(p), s"pct $p: got ${got(p)} want ${brute(p)}")
    // hand-check the boundary-class split: pct 50 -> target 5, classes
    // (4),(3),(1,1): one token of the count-3 class completes it
    assert(got(50L) == ((2L, 7L)))
  }

  test("vocabCoverage: every row reports the same exact n_tokens") {
    val rows = Coverage.vocabCoverage(docs).collect()
    assert(rows.forall(_.getAs[Long]("n_tokens") == 9L))
  }

  test("maintained vocabulary sink: streamed state stats == batch stats (q225)") {
    // additive (token, cnt) merge across real checkpointed micro-batches
    // must reproduce the batch Good-Turing row bit for bit — and a
    // batch count that does NOT divide the doc count exercises the
    // uneven-residue-class path
    val many = Seq(
      (1L, "a a a b b c"), (2L, "a b d"), (3L, "c c e"),
      (4L, "f"), (5L, "a b c d e f g")
    ).toDF("doc_id", "text")
    val batch = Coverage.goodTuring(many).collect().toSeq
    val streamed = graft.stream.CorpusStream
      .maintainedVocabStats(many, 3).collect().toSeq
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Eval
import graft.text.Curation

/** Classifier-evaluation family (q210/q211/q214) + budget selection /
  * mixture planning (q212/q213). Unit laws are brute-force replays on
  * tiny in-memory fixtures — the value-level gate at sf is the DuckDB
  * oracle (tools/compare_local.py / driver t2).
  */
class EvalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** 8 vectors, 2 dims, linearly separable: label>=5 (positive) sits
    * high on dim0 / low on dim1; two positive and two negative score
    * ties are forced by duplicating vectors. */
  private lazy val emb = Seq(
    (1L, 9, Array(0.9f, 0.1f)),
    (2L, 8, Array(0.9f, 0.1f)), // tie with vec 1
    (3L, 7, Array(0.8f, 0.2f)),
    (4L, 6, Array(0.7f, 0.3f)),
    (5L, 1, Array(0.1f, 0.9f)),
    (6L, 2, Array(0.1f, 0.9f)), // tie with vec 5
    (7L, 3, Array(0.2f, 0.8f)),
    (8L, 0, Array(0.3f, 0.6f))
  ).toDF("vec_id", "label", "embedding")

  private lazy val scored: Map[Long, (Long, Long)] =
    Eval.probeScores(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("probe scores separate a linearly separable fixture") {
    val pos = scored.collect { case (_, (1L, s)) => s }
    val neg = scored.collect { case (_, (0L, s)) => s }
    assert(pos.size == 4 && neg.size == 4)
    assert(pos.min > neg.max,
      s"probe failed to separate: pos=$pos neg=$neg")
    // duplicated vectors must score identically (exact integer probe)
    assert(scored(1L)._2 == scored(2L)._2)
    assert(scored(5L)._2 == scored(6L)._2)
  }

  test("aucReport equals the brute-force pairwise Mann-Whitney") {
    val pos = scored.values.collect { case (1L, s) => s }.toSeq
    val neg = scored.values.collect { case (0L, s) => s }.toSeq
    val num2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    val r = Eval.aucReport(emb).collect().head
    assert(r.getAs[Long]("n_pos") == pos.size && r.getAs[Long]("n_neg") == neg.size)
    assert(r.getAs[Long]("auc_num2") == num2,
      s"tie-corrected numerator mismatch: ${r.getAs[Long]("auc_num2")} vs $num2")
    assert(r.getAs[Long]("auc_ppm") ==
      num2 * 1000000L / (pos.size.toLong * neg.size * 2))
    // separable fixture: AUC == 1 exactly
    assert(r.getAs[Long]("auc_ppm") == 1000000L)
  }

  test("prCurve replays the keep-iff-score>=t confusion table") {
    val all = scored.values.toSeq
    val rows = Eval.prCurve(emb).collect()
    val thresholds = rows.map(_.getLong(0))
    assert(thresholds.toSeq == thresholds.sorted(Ordering[Long].reverse).toSeq)
    rows.foreach { r =>
      val t = r.getLong(0)
      val kept = all.filter(_._2 >= t)
      assert(r.getAs[Long]("cum_pos") == kept.count(_._1 == 1L), s"TP at $t")
      assert(r.getAs[Long]("cum_n") == kept.size.toLong, s"TP+FP at $t")
    }
    assert(rows.last.getAs[Long]("cum_n") == all.size.toLong)
  }

  test("calibrationBins: exact partition of the score range") {
    val rows = Eval.calibrationBins(emb, bins = 4).collect()
    val lo = scored.values.map(_._2).min
    val hi = scored.values.map(_._2).max
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 4))
    assert(rows.map(_.getAs[Long]("n")).sum == scored.size.toLong)
    assert(rows.map(_.getAs[Long]("n_pos")).sum == 4L)
    // the integer bin law keeps both extrema inside [0, B-1]
    val binOf = (s: Long) => (s - lo) * 4 / (hi - lo + 1)
    assert(binOf(lo) == 0L && binOf(hi) == 3L)
    rows.foreach { r =>
      val members = scored.values.filter(v => binOf(v._2) == r.getLong(0))
      assert(r.getAs[Long]("n") == members.size.toLong)
      assert(r.getAs[Long]("sum_shift") == members.map(_._2 - lo).sum)
      assert(r.getAs[Long]("pos_rate_pm") ==
        members.count(_._1 == 1L).toLong * 1000 / members.size)
    }
  }

  test("bestF1 equals the brute-force threshold sweep (q215)") {
    val all = scored.values.toSeq
    val p = all.count(_._1 == 1L).toLong
    val best = all.map(_._2).distinct.sorted(Ordering[Long].reverse).map { t =>
      val kept = all.filter(_._2 >= t)
      val tp = kept.count(_._1 == 1L).toLong
      val cumN = kept.size.toLong
      (t, tp, cumN - tp, p - tp, tp * 2000000L / (cumN + p))
    }.maxBy { case (t, _, _, _, f1) => (f1, t) } // ties -> higher threshold
    val r = Eval.bestF1(emb).collect()
    assert(r.length == 1)
    val g = (r.head.getAs[Long]("score"), r.head.getAs[Long]("tp"),
      r.head.getAs[Long]("fp"), r.head.getAs[Long]("fn"),
      r.head.getAs[Long]("f1_ppm"))
    assert(g == best, s"got $g want $best")
    // separable fixture: perfect F1 at the positive minimum
    assert(g._5 == 1000000L && g._3 == 0L && g._4 == 0L)
  }

  test("ksSeparation equals the brute-force CDF gap scan (q217)") {
    val all = scored.values.toSeq
    val p = all.count(_._1 == 1L).toLong
    val n = all.size.toLong - p
    val best = all.map(_._2).distinct.sorted.map { s =>
      val cpos = all.count(v => v._1 == 1L && v._2 <= s).toLong
      val cneg = all.count(v => v._1 == 0L && v._2 <= s).toLong
      (math.abs(cpos * n - cneg * p), s)
    }.maxBy { case (num, s) => (num, -s) } // ties -> lowest score
    val r = Eval.ksSeparation(emb).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_pos") == p && r.head.getAs[Long]("n_neg") == n)
    assert(r.head.getAs[Long]("ks_num") == best._1 &&
      r.head.getAs[Long]("score_at") == best._2,
      s"got (${r.head.getAs[Long]("ks_num")}, ${r.head.getAs[Long]("score_at")}) want $best")
    assert(r.head.getAs[Long]("ks_ppm") == best._1 * 1000000L / (p * n))
    // separable fixture: the CDFs separate completely -> KS == 1
    assert(r.head.getAs[Long]("ks_ppm") == 1000000L)
  }

  test("aucBySlice: per-slice pairwise replay, one-class slice NULL (q216)") {
    // en: both classes (two tied pairs); fr: positives only and
    // zh: negatives only — both one-class slices must grade auc_ppm
    // NULL while keeping exact counts
    val langDocs = Seq(
      (1L, "en"), (2L, "en"), (5L, "en"), (6L, "en"),
      (3L, "fr"), (4L, "fr"),
      (7L, "zh"), (8L, "zh")
    ).toDF("doc_id", "lang")
    val rows = Eval.aucBySlice(emb, langDocs).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("en", "fr", "zh"))
    val byLang = Map(
      "en" -> Seq(1L, 2L, 5L, 6L), "fr" -> Seq(3L, 4L), "zh" -> Seq(7L, 8L))
    rows.foreach { r =>
      val vs = byLang(r.getString(0)).map(scored)
      val pos = vs.collect { case (1L, s) => s }
      val neg = vs.collect { case (0L, s) => s }
      assert(r.getAs[Long]("n_pos") == pos.size.toLong)
      assert(r.getAs[Long]("n_neg") == neg.size.toLong)
      val num2 = (for (pp <- pos; nn <- neg)
        yield if (pp > nn) 2L else if (pp == nn) 1L else 0L).sum
      assert(r.getAs[Long]("auc_num2") == num2, s"${r.getString(0)}: num2")
      if (pos.nonEmpty && neg.nonEmpty)
        assert(r.getAs[Long]("auc_ppm") ==
          num2 * 1000000L / (pos.size.toLong * neg.size * 2))
      else assert(r.isNullAt(r.fieldIndex("auc_ppm")),
        s"one-class slice ${r.getString(0)} must grade NULL")
    }
  }

  test("probeScores requires both classes nonempty") {
    val oneClass = emb.filter(col("label") >= 5)
    val e = intercept[Exception] { Eval.probeScores(oneClass).collect() }
    assert(e.getMessage.contains("both classes"),
      s"expected the loud class guard, got: ${e.getMessage}")
  }

  // ---- budget selection (q212) ----

  /** Stopword-density fixture with a deliberate tie class: docs 2 and
    * 3 share a score, and the budget lands inside their class. */
  private lazy val docs = Seq(
    (1L, "the a of the a of"),              // 6 tok, all stop: score 1000000
    (2L, "the a zz qq"),                    // 4 tok, 2 stop: 500000
    (3L, "of in ww ee"),                    // 4 tok, 2 stop: 500000 (tie)
    (4L, "a xx yy zz"),                     // 4 tok, 1 stop: 250000
    (5L, "xx yy zz qq ww ee rr tt"),        // 8 tok, 0 stop: 0
    (6L, "")                                // 0 tok: excluded
  ).toDF("doc_id", "text")

  private def bruteBudget(num: Long, den: Long): Seq[Long] = {
    val base = Seq((1L, 1000000L, 6L), (2L, 500000L, 4L), (3L, 500000L, 4L),
      (4L, 250000L, 4L), (5L, 0L, 8L))
    val budget = base.map(_._3).sum * num / den
    val ordered = base.sortBy { case (id, s, _) => (-s, id) }
    ordered.scanLeft((0L, 0L)) { case ((_, cum), (id, _, t)) => (id, cum + t) }
      .drop(1).takeWhile(_._2 <= budget).map(_._1).sorted
  }

  test("budgetSelect equals the global greedy prefix, tie class split") {
    // budget = 26*3/10 = 7: doc 1 (6 tok) fits, tie class {2,3} has
    // room for exactly nothing more (6+4 > 7) — the tie sweep must
    // admit zero tie docs
    val got = Curation.budgetSelect(docs, 3, 10).collect().map(_.getLong(0)).toSeq
    assert(got == bruteBudget(3, 10), s"got $got")
    // budget = 26*6/10 = 15: doc1 + doc2 (tie winner by doc_id) fit
    // (10 ≤ 15), doc3 would reach 14 ≤ 15 too — both tie docs in
    val got6 = Curation.budgetSelect(docs, 6, 10).collect().map(_.getLong(0)).toSeq
    assert(got6 == bruteBudget(6, 10), s"got $got6")
    // budget = everything: the boundary-empty branch
    val all = Curation.budgetSelect(docs, 1, 1).collect().map(_.getLong(0)).toSeq
    assert(all == Seq(1L, 2L, 3L, 4L, 5L), s"got $all")
  }

  test("budgetSelect output carries the exact score and token columns") {
    val m = Curation.budgetSelect(docs, 1, 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == ((1000000L, 6L)))
    assert(m(2L) == ((500000L, 4L)))
    assert(m(5L) == ((0L, 8L)))
  }

  // ---- selection composition shift (q222) ----

  test("selectionShift audits budgetSelect exactly, per source") {
    val src = docs.withColumn("source",
      when(col("doc_id") <= 3L, "web").otherwise("books"))
    val keptIds = Curation.budgetSelect(src, 3, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> n_tok
    // token law over ALL docs (zero-token doc 6 counts in docs_total)
    val base = Map(1L -> 6L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 8L, 6L -> 0L)
    val srcOf = (id: Long) => if (id <= 3L) "web" else "books"
    val rows = Curation.selectionShift(src, 3, 10).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("books", "web"))
    rows.foreach { r =>
      val s = r.getString(0)
      val ids = base.keys.toSeq.filter(srcOf(_) == s)
      val kept = ids.filter(keptIds.contains)
      assert(r.getAs[Long]("docs_total") == ids.size.toLong)
      assert(r.getAs[Long]("tok_total") == ids.map(base).sum)
      assert(r.getAs[Long]("docs_kept") == kept.size.toLong)
      assert(r.getAs[Long]("tok_kept") == kept.map(base).sum)
      assert(r.getAs[Long]("keep_pm") == kept.size.toLong * 1000 / ids.size)
      assert(r.getAs[Long]("tok_keep_pm") ==
        kept.map(base).sum * 1000 / ids.map(base).sum)
    }
  }

  // ---- Spearman components (q223) ----

  test("spearmanComponents equals brute-force average-rank Pearson moments") {
    // doc metrics: x = stopword ppm, y = token count (docs fixture,
    // doc 6 empty -> excluded): x ties on docs 2/3, y ties on 2/3/4
    val xs = Map(1L -> 1000000L, 2L -> 500000L, 3L -> 500000L,
      4L -> 250000L, 5L -> 0L)
    val ys = Map(1L -> 6L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 8L)
    def rank2(m: Map[Long, Long]): Map[Long, Long] = m.map { case (id, v) =>
      id -> (2L * m.values.count(_ < v) + m.values.count(_ == v) + 1L)
    }
    val (r2x, r2y) = (rank2(xs), rank2(ys))
    val n = xs.size.toLong
    val c = n * (n + 1) * (n + 1)
    val ids = xs.keys.toSeq
    val sxy = ids.map(i => r2x(i) * r2y(i)).sum - c
    val varx = ids.map(i => r2x(i) * r2x(i)).sum - c
    val vary = ids.map(i => r2y(i) * r2y(i)).sum - c
    val r = graft.quality.RankCorr.spearmanComponents(docs).collect().head
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("sxy") == sxy, s"sxy ${r.getAs[Long]("sxy")} vs $sxy")
    assert(r.getAs[Long]("varx") == varx && r.getAs[Long]("vary") == vary)
    assert(r.getAs[Long]("rho_sign") == java.lang.Long.signum(sxy).toLong)
    // sanity vs scipy-style check: rho = sxy/sqrt(varx*vary) in [-1, 1]
    val rho = sxy.toDouble / math.sqrt(varx.toDouble * vary.toDouble)
    assert(rho >= -1.0 && rho <= 1.0)
  }

  // ---- confusion at best F1 (q228) + per-source calibration (q229) ----

  test("confusionAtBestF1 replays the brute-force sweep and agrees with bestF1") {
    val all = scored.values.toSeq
    val p = all.count(_._1 == 1L).toLong
    val nneg = all.count(_._1 == 0L).toLong
    val cand = all.map(_._2).distinct.map { t =>
      val tp = all.count(v => v._1 == 1L && v._2 >= t).toLong
      val cumN = all.count(_._2 >= t).toLong
      (t, tp, cumN - tp, p - tp, nneg - (cumN - tp),
        tp * 2000000L / (cumN + p))
    }
    val want = cand.maxBy { case (t, _, _, _, _, f1) => (f1, t) }
    val r = Eval.confusionAtBestF1(emb).collect().head
    assert(r.getAs[Long]("score") == want._1)
    assert(r.getAs[Long]("tp") == want._2 && r.getAs[Long]("fp") == want._3)
    assert(r.getAs[Long]("fn") == want._4 && r.getAs[Long]("tn") == want._5)
    assert(r.getAs[Long]("f1_ppm") == want._6)
    assert(r.getAs[Long]("precision_ppm") ==
      want._2 * 1000000L / (want._2 + want._3))
    assert(r.getAs[Long]("recall_ppm") == want._2 * 1000000L / p)
    assert(r.getAs[Long]("accuracy_ppm") ==
      (want._2 + want._5) * 1000000L / (p + nneg))
    // the two queries must name the SAME deployed threshold
    val bf = Eval.bestF1(emb).collect().head
    assert(bf.getAs[Long]("score") == r.getAs[Long]("score"))
    assert(bf.getAs[Long]("tp") == r.getAs[Long]("tp"))
    // separable fixture: the best threshold commits zero errors
    assert(r.getAs[Long]("fp") == 0L && r.getAs[Long]("fn") == 0L)
    assert(r.getAs[Long]("accuracy_ppm") == 1000000L)
  }

  test("calibrationBySource replays q211's bin law per source on the global grid") {
    val srcOf = Map(1L -> "web", 2L -> "books", 3L -> "web", 4L -> "books",
      5L -> "web", 6L -> "books", 7L -> "web", 8L -> "books")
    val srcDocs = srcOf.toSeq.map { case (id, s) => (id, s"doc $id", "en", s, 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val all = scored.toSeq.map { case (id, (y, s)) => (id, y, s) }
    val lo = all.map(_._3).min
    val width = all.map(_._3).max - lo + 1L
    val want = all.groupBy(v => (srcOf(v._1), (v._3 - lo) * 10L / width))
      .map { case ((src, bin), vs) =>
        (src, bin) -> (vs.size.toLong, vs.map(_._2).sum,
          vs.map(_._2).sum * 1000L / vs.size, vs.map(_._3 - lo).sum)
      }
    val rows = Eval.calibrationBySource(emb, srcDocs).collect()
    assert(rows.length == want.size)
    // sorted by (source, bin)
    val keys = rows.map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(keys == keys.sorted)
    rows.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (n, npos, rate, shift) = want(k)
      assert(r.getAs[Long]("n") == n, s"$k n")
      assert(r.getAs[Long]("n_pos") == npos, s"$k n_pos")
      assert(r.getAs[Long]("pos_rate_pm") == rate, s"$k rate")
      assert(r.getAs[Long]("sum_shift") == shift, s"$k shift")
    }
  }

  test("bestF1BySource replays the per-source brute-force sweep, q215 law per slice (q230)") {
    // web/books carry both classes; z is NEGATIVE-ONLY (p = 0), the
    // loud-not-wrong edge: every threshold sweeps f1_ppm = 0 and the
    // tie law deterministically reports the HIGHEST threshold with
    // tp = fn = 0
    val srcOf = Map(1L -> "web", 3L -> "web", 7L -> "web",
      2L -> "books", 4L -> "books", 8L -> "books",
      5L -> "z", 6L -> "z")
    val srcDocs = srcOf.toSeq.map { case (id, s) => (id, s"doc $id", "en", s, 6L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val want = scored.toSeq.groupBy(v => srcOf(v._1)).map { case (src, vs) =>
      val all = vs.map(_._2) // (y, score)
      val p = all.count(_._1 == 1L).toLong
      src -> all.map(_._2).distinct.sorted(Ordering[Long].reverse).map { t =>
        val kept = all.filter(_._2 >= t)
        val tp = kept.count(_._1 == 1L).toLong
        val cumN = kept.size.toLong
        (t, tp, cumN - tp, p - tp, tp * 2000000L / (cumN + p))
      }.maxBy { case (t, _, _, _, f1) => (f1, t) } // SAME tie law as q215
    }
    val rows = Eval.bestF1BySource(emb, srcDocs).collect()
    assert(rows.length == want.size)
    assert(rows.map(_.getString(0)).toSeq ==
      rows.map(_.getString(0)).toSeq.sorted, "ordered by source")
    rows.foreach { r =>
      val g = (r.getAs[Long]("score"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Long]("fn"), r.getAs[Long]("f1_ppm"))
      assert(g == want(r.getString(0)), s"${r.getString(0)}: got $g")
    }
    // the z slice edge stated explicitly
    val z = rows.find(_.getString(0) == "z").get
    assert(z.getAs[Long]("f1_ppm") == 0L && z.getAs[Long]("tp") == 0L &&
      z.getAs[Long]("fn") == 0L)
    assert(z.getAs[Long]("score") ==
      scored.collect { case (id, (_, s)) if srcOf(id) == "z" => s }.max)
    // and the sliced law agrees with the global one where the slice IS
    // the whole corpus: a single-source map reproduces bestF1 exactly
    val oneSrc = srcOf.keys.toSeq.map(id => (id, s"doc $id", "en", "all", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val global = Eval.bestF1(emb).collect().head
    val sliced = Eval.bestF1BySource(emb, oneSrc).collect().head
    assert((sliced.getAs[Long]("score"), sliced.getAs[Long]("tp"),
        sliced.getAs[Long]("fp"), sliced.getAs[Long]("fn"),
        sliced.getAs[Long]("f1_ppm")) ==
      (global.getAs[Long]("score"), global.getAs[Long]("tp"),
        global.getAs[Long]("fp"), global.getAs[Long]("fn"),
        global.getAs[Long]("f1_ppm")),
      "single-source slice must equal the global operating point")
  }

  // ---- past-envelope fallbacks (round-11: automatic switch, not refusal) ----

  test("probeScoresSampled at sampleMod=1 is the exact path verbatim") {
    val enc = Eval.encodedClasses(emb)
    val exact = Eval.probeScores(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val viaSeam = Eval.probeScoresSampled(enc, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(viaSeam.toSeq == exact.toSeq)
  }

  test("probeScoresSampled: sample-fit probe still separates and stays deterministic") {
    // 64 separable vectors so any hash half-sample keeps both classes
    val big = (1L to 64L).map { i =>
      val pos = i % 2 == 0
      (i, if (pos) 9 else 1,
        if (pos) Array(0.8f + (i % 5) * 0.02f, 0.1f)
        else Array(0.1f, 0.8f + (i % 5) * 0.02f))
    }.toDF("vec_id", "label", "embedding")
    val enc = Eval.encodedClasses(big)
    def run() = Eval.probeScoresSampled(enc, 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val a = run()
    assert(a == run(), "hash-deterministic sample must reproduce bit-identically")
    val pos = a.collect { case (_, 1L, s) => s }
    val neg = a.collect { case (_, 0L, s) => s }
    assert(pos.size == 32 && neg.size == 32, "fallback scores the WHOLE corpus")
    assert(pos.min > neg.max, s"sample-fit probe failed to separate")
  }

  test("planSampleMod: in-envelope keeps k=1; past-envelope picks the bounding power of two") {
    assert(Eval.planSampleMod(64L, 1000L, 1000L) == 1L)
    assert(Eval.planSampleMod(64L, 100000L, 100000L) == 1L) // graded SFs
    val (d, n0, n1) = (64L, 3000000000L, 3000000000L) // far past envelope
    val k = Eval.planSampleMod(d, n0, n1)
    assert(k > 1L && (k & (k - 1)) == 0L, s"k=$k must be a power of two")
    val cap = BigInt(Long.MaxValue) / 65025 / d
    assert((BigInt(n0) / k) * (BigInt(n1) / k) * 4 <= cap, s"k=$k too small")
    assert((BigInt(n0) / (k / 2)) * (BigInt(n1) / (k / 2)) * 4 > cap,
      s"k=$k not minimal")
  }

  test("selection TV: double fallback equals the exact BIGINT path on in-envelope fixtures") {
    val kept = Curation.budgetSelect(docs, 3, 10).select(col("doc_id"))
    val toks = docs.select(col("doc_id"),
      explode(filter(graft.text.TextOps.tokens(col("text")),
        t => length(t) > 0)).as("token"))
    val e = Curation.tvFromTokens(toks, kept, exact = true).collect().head
    val d = Curation.tvFromTokens(toks, kept, exact = false).collect().head
    assert(d.getAs[Long]("n_all_tok") == e.getAs[Long]("n_all_tok"))
    assert(d.getAs[Long]("n_sel_tok") == e.getAs[Long]("n_sel_tok"))
    assert(d.getAs[Long]("vocab") == e.getAs[Long]("vocab"))
    assert(d.getAs[Double]("tv_num") == e.getAs[Long]("tv_num").toDouble)
    // the NULL guard threshold (2K >= 1e6) is shared by both paths;
    // tiny fixture sits below it, so tv_ppm is NULL on both (tv_ppm's
    // fallback law is single-floor — deliberately NOT asserted equal,
    // see the tvFromTokens scaladoc)
    assert(d.isNullAt(d.fieldIndex("tv_ppm")) == e.isNullAt(e.fieldIndex("tv_ppm")))
  }

  test("auto-switch wiring: a lowered envelope routes the PUBLIC entries to the double paths") {
    // spearman: envelope=1 < n=5 -> the double path must come back
    // through the public wiring with DoubleType moments equal to exact
    val e = graft.quality.RankCorr.spearmanComponents(docs).collect().head
    val sw = graft.quality.RankCorr.spearmanComponents(docs, envelope = 1L)
    assert(sw.schema("sxy").dataType == org.apache.spark.sql.types.DoubleType)
    val d = sw.collect().head
    assert(d.getAs[Long]("n") == e.getAs[Long]("n"))
    assert(d.getAs[Double]("sxy") == e.getAs[Long]("sxy").toDouble)
    // TV: cap=0 forces the double branch through the public wiring
    val te = Curation.selectionTvDistortion(docs, 3, 10).collect().head
    val tsw = Curation.selectionTvDistortion(docs, 3, 10, exactCap = BigInt(0))
    assert(tsw.schema("tv_num").dataType == org.apache.spark.sql.types.DoubleType)
    val td = tsw.collect().head
    assert(td.getAs[Long]("vocab") == te.getAs[Long]("vocab"))
    assert(td.getAs[Double]("tv_num") == te.getAs[Long]("tv_num").toDouble)
  }

  test("spearmanDouble equals spearmanExact (cast) on in-envelope fixtures") {
    val base = graft.quality.RankCorr.scoredBase(docs)
    val e = graft.quality.RankCorr.spearmanExact(base).collect().head
    val d = graft.quality.RankCorr.spearmanDouble(base).collect().head
    assert(d.getAs[Long]("n") == e.getAs[Long]("n"))
    assert(d.getAs[Double]("sxy") == e.getAs[Long]("sxy").toDouble)
    assert(d.getAs[Double]("varx") == e.getAs[Long]("varx").toDouble)
    assert(d.getAs[Double]("vary") == e.getAs[Long]("vary").toDouble)
    assert(d.getAs[Long]("rho_sign") == e.getAs[Long]("rho_sign"))
  }

  test("spearmanComponents: a perfect monotone pair reads rho == 1 exactly") {
    val mono = Seq(
      (1L, "the a b"),            // 3 tok, 2 stop -> x=666666
      (2L, "the a b c"),          // 4 tok, 2 stop -> x=500000
      (3L, "the a b c d e f g")   // 8 tok, 2 stop -> x=250000
    ).toDF("doc_id", "text")
    // x strictly decreasing in y: rho must be exactly -1 -> sxy^2 == varx*vary
    val r = graft.quality.RankCorr.spearmanComponents(mono).collect().head
    val (sxy, vx, vy) = (r.getAs[Long]("sxy"), r.getAs[Long]("varx"),
      r.getAs[Long]("vary"))
    assert(r.getAs[Long]("rho_sign") == -1L)
    assert(sxy * sxy == vx * vy, s"|rho| != 1: $sxy^2 vs $vx*$vy")
  }

  // ---- selection TV distortion (q227) ----

  test("selectionTvDistortion equals the brute-force shared-denominator TV") {
    val texts = Map(1L -> "the a of the a of", 2L -> "the a zz qq",
      3L -> "of in ww ee", 4L -> "a xx yy zz", 5L -> "xx yy zz qq ww ee rr tt")
    val keptIds = Curation.budgetSelect(docs, 3, 10).collect()
      .map(_.getLong(0)).toSet
    val allToks = texts.values.flatMap(_.split(" ")).toSeq
    val selToks = texts.collect { case (id, t) if keptIds(id) => t }
      .flatMap(_.split(" ")).toSeq
    val cAll = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cSel = selToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nAll, nSel) = (allToks.size.toLong, selToks.size.toLong)
    val tvNum = cAll.keys.toSeq.map(t =>
      math.abs(cSel.getOrElse(t, 0L) * nAll - cAll(t) * nSel)).sum
    val r = Curation.selectionTvDistortion(docs, 3, 10).collect().head
    assert(r.getAs[Long]("n_all_tok") == nAll && r.getAs[Long]("n_sel_tok") == nSel)
    assert(r.getAs[Long]("vocab") == cAll.size.toLong)
    assert(r.getAs[Long]("tv_num") == tvNum, s"tv_num ${r.getAs[Long]("tv_num")} vs $tvNum")
    // the fixture denominator underflows the ppm floor -> NULL, loudly
    if (nSel * nAll * 2 / 1000000 > 0)
      assert(r.getAs[Long]("tv_ppm") == tvNum / (nSel * nAll * 2 / 1000000))
    else assert(r.isNullAt(r.fieldIndex("tv_ppm")))
    // TV bound: tv_num <= 2 * nSel * nAll always
    assert(tvNum <= 2 * nSel * nAll)
  }

  test("selectionTvDistortion: selecting everything reads TV == 0") {
    val r = Curation.selectionTvDistortion(docs, 1, 1).collect().head
    assert(r.getAs[Long]("tv_num") == 0L)
    assert(r.getAs[Long]("n_sel_tok") == r.getAs[Long]("n_all_tok"))
  }

  // ---- mixture plan (q213) ----

  test("mixturePlan: largest-remainder targets sum exactly to the budget") {
    val src = Seq(
      (1L, "aa bb cc dd ee", "web"),     // 5 tok
      (2L, "aa bb", "web"),              // 2 tok -> web 7
      (3L, "aa bb cc", "books"),         // 3 tok
      (4L, "aa", "code")                 // 1 tok; total 11
    ).toDF("doc_id", "text", "source")
    val rows = Curation.mixturePlan(src, 1, 2).collect()
    // budget = 11/2 = 5, k = 3: base 1 each, 5 % 3 = 2 leftovers to
    // books and code (source-name order)
    val m = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("tok_s"), r.getAs[Long]("target_tok"),
        r.getAs[Long]("epochs_ppm"), r.getAs[Long]("upsample"))).toMap
    assert(rows.map(_.getAs[Long]("target_tok")).sum == 5L)
    assert(m("books") == ((3L, 2L, 666666L, 0L)))
    assert(m("code") == ((1L, 2L, 2000000L, 1L)))
    assert(m("web") == ((7L, 1L, 142857L, 0L)))
  }
}

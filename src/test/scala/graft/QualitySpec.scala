package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.quality.{Expectations, Profiler}
import graft.text.HeavyHitters

/** Data-quality operators (round 3): column profiler, expectation
  * checks, bounded-memory heavy hitters, stratified sampling.
  */
class QualitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c", "en", "s1"),
    (2L, "a b", "en", "s1"),
    (3L, null.asInstanceOf[String], "en", "s2"),
    (4L, "d", "fr", "s2"),
    (5L, "a", "fr", "s2")
  ).toDF("doc_id", "text", "lang", "source")

  test("profile: exact per-column null/distinct/min/max/max_len") {
    val p = Profiler.profile(docs, Seq("doc_id", "text", "lang"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5), r.getLong(6))).toMap
    assert(p("doc_id") == ((5L, 0L, 5L, "1", "5", 1L)))
    assert(p("text") == ((4L, 1L, 4L, "a", "d", 5L)))
    assert(p("lang") == ((5L, 0L, 2L, "en", "fr", 2L)))
  }

  test("profile: approx variant has the same shape; exact counts for tiny input") {
    val p = Profiler.profileApprox(docs, Seq("lang")).collect()
    assert(p.length == 1 && p.head.getString(0) == "lang")
    // HLL++ is exact at cardinality 2
    assert(p.head.getLong(3) == 2L)
  }

  test("expectations: clean rules pass, violations counted per rule") {
    val df = Seq(
      (1L, 1, "A", Some(5.0)),
      (1L, 2, "A", Some(60.0)),   // range violation
      (2L, 1, "X", Some(10.0)),   // set violation
      (2L, 1, "A", None)          // dup key (and a null qty)
    ).toDF("k", "ln", "flag", "qty")
    val out = Expectations.check(df, Seq(
      Expectations.NotNull("qty"),
      Expectations.InSet("flag", Seq("A", "B")),
      Expectations.InRange("qty", 0.0, 50.0),
      Expectations.Unique(Seq("k", "ln"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("not_null(qty)") == ((1L, false)))
    assert(out("in_set(flag)") == ((1L, false)))
    assert(out("in_range(qty)") == ((1L, false)))
    assert(out("unique(k,ln)") == ((1L, false)))
    val clean = Expectations.check(df.filter(col("k") === 999),
      Seq(Expectations.NotNull("qty"), Expectations.Unique(Seq("k"))))
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    assert(clean.forall(_ == ((0L, true))), "empty input must pass all rules")
  }

  test("misraGries: survivors contain every token above the n/m bound") {
    // adversarial stream: 3 heavy tokens among 200 distinct light ones,
    // capacity far below the vocabulary
    val heavy = Seq.fill(50)("H1") ++ Seq.fill(40)("H2") ++ Seq.fill(30)("H3")
    val light = (0 until 200).map(i => s"t$i")
    val stream = new scala.util.Random(7).shuffle(heavy ++ light ++ light)
    val m = 20
    val survivors = HeavyHitters.misraGries(stream.iterator, m).toSet
    val n = stream.size
    for (t <- Seq("H1", "H2", "H3")) {
      val freq = stream.count(_ == t)
      assert(freq > n / m, s"test setup: $t must clear the bound")
      assert(survivors.contains(t), s"$t (freq $freq > $n/$m) must survive")
    }
    assert(survivors.size <= m, "summary must stay within capacity")
  }

  test("topKTokens matches the exact top-k when counts clear the bound") {
    // 40 docs over a 500-word vocabulary with a skewed head; capacity 64
    // forces evictions inside partitions (vocab >> m) while the head
    // still clears n/m — result must equal the exact top-k.
    val words = (0 until 500).map(i => s"w$i")
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 40).map { d =>
      val body = (0 until 300).map { _ =>
        val r = rnd.nextInt(10)
        if (r < 6) words(rnd.nextInt(8))        // heavy head
        else words(8 + rnd.nextInt(492))        // long tail
      }
      (d.toLong, body.mkString(" "))
    }.toDF("doc_id", "text").repartition(8)
    val got = HeavyHitters.topKTokens(corpus, 5, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // exact reference by plain groupBy
    val exact = corpus.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(x => (x._1, x._2)).toSeq == exact.toSeq,
      s"MG top-k diverged: got ${got.toSeq} exact ${exact.toSeq}")
    assert(got.forall(_._4), "head counts must clear the n/m bound here")
    assert(got.map(_._3).toSeq == (1L to 5L), "ranks must be 1..k")
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c EDITED"), (4L, "d")).toDF("doc_id", "text")
    val out = graft.ops.SetOps.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"),
      s"got $out") // 2 is unchanged and must not appear
  }

  test("bigramPmi: collocated pair scores above independent pair") {
    // "x y" always together (perfect collocation); "a" pairs with many
    val df = Seq(
      (1L, "x y a p"), (2L, "x y a q"), (3L, "x y a r"), (4L, "a s x y")
    ).toDF("doc_id", "text")
    val out = graft.text.TextOps.bigramPmi(df, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val pmiXY = out(("x", "y"))
    // x appears 4x, y 4x, "x y" 4x of 12 bigrams; N1=16 tokens
    // pmi = ln(4*16*16/(12*4*4)) = ln(16/3)
    assert(math.abs(pmiXY - math.log(16.0 / 3.0)) < 1e-5, s"pmi(x,y)=$pmiXY")
    // and it must outrank the incidental ("y","a") pair
    assert(out.get(("y", "a")).forall(_ < pmiXY))
  }

  test("quantileBand keeps exactly the inner band, boundaries inclusive") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val kept = graft.quality.Filters.quantileBand(df, "v", 0.1, 0.9)
      .collect().map(_.getLong(1)).sorted
    // p10 of 1..100 (interpolated) = 10.9, p90 = 90.1 → keep 11..90
    assert(kept.head == 11L && kept.last == 90L && kept.length == 80,
      s"kept ${kept.length} rows [${kept.head}, ${kept.last}]")
  }

  test("PSI drift: identical distributions score ~0, a shifted one scores high") {
    val base = (1 to 1000).map(i => i.toLong % 100).toDF("v")
    val same = (1 to 1000).map(i => (i + 7).toLong % 100).toDF("v")
    val shifted = (1 to 1000).map(i => 60 + (i.toLong % 40)).toDF("v")
    def total(cur: org.apache.spark.sql.DataFrame) =
      graft.quality.Drift.psi(base, cur, "v", 10)
        .agg(sum(col("psi_term"))).first().getDouble(0)
    val psiSame = total(same)
    val psiShift = total(shifted)
    assert(math.abs(psiSame) < 0.05, s"A/A PSI should be ~0, got $psiSame")
    assert(psiShift > 0.25, s"shifted PSI should alarm (>0.25), got $psiShift")
    // spine always complete: one row per bucket even when empty
    assert(graft.quality.Drift.psi(base, shifted, "v", 10).count() == 10)
  }

  test("stratifiedSample caps every stratum at n, deterministically") {
    val many = (0 until 400).map(i => (i.toLong, s"lang${i % 2}", s"src${i % 5}"))
      .toDF("doc_id", "lang", "source")
    val s1 = graft.ops.Sampling.stratifiedSample(many, Seq("lang", "source"),
      "doc_id", "salty", 7).select("doc_id", "lang", "source", "rn")
    val rows = s1.collect()
    val perStratum = rows.groupBy(r => (r.getString(1), r.getString(2)))
    assert(perStratum.size == 10)
    assert(perStratum.values.forall(_.length == 7), "each stratum capped at 7")
    perStratum.values.foreach { g =>
      assert(g.map(_.getLong(3)).sorted.toSeq == (1L to 7L)) }
    // determinism: same salt → same picks; different salt → different picks
    val s2 = graft.ops.Sampling.stratifiedSample(many, Seq("lang", "source"),
      "doc_id", "salty", 7).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == s2)
    val s3 = graft.ops.Sampling.stratifiedSample(many, Seq("lang", "source"),
      "doc_id", "other", 7).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s2 != s3, "different salt should draw a different sample")
  }

  test("chi-square cells: zero contrib under perfect independence, margins sum") {
    import spark.implicits._
    // 2x2 balanced: o == expected everywhere → every contrib is 0
    val indep = Seq(
      (1L, "a", "en", "s1"), (2L, "a", "en", "s2"),
      (3L, "a", "fr", "s1"), (4L, "a", "fr", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val cells = graft.quality.Drift.chiSquareCells(indep, "lang", "source").collect()
    assert(cells.forall(_.getDouble(4) == 0.0))
    assert(cells.map(_.getLong(2)).sum == 4L)
    // a perfectly associated table scores the maximum n per diagonal cell
    val assoc = Seq(
      (1L, "a", "en", "s1"), (2L, "a", "en", "s1"),
      (3L, "a", "fr", "s2"), (4L, "a", "fr", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val chi2 = graft.quality.Drift.chiSquareCells(assoc, "lang", "source")
      .agg(sum("contrib")).first().getDouble(0)
    assert(chi2 == 4.0, s"2x2 perfect association should give chi2 = n, got $chi2")
  }

  test("tokenEntropy: 0 bits for constant doc, log2(n) for all-distinct") {
    val d = Seq(
      (1L, "x x x x", "en", "s"),          // constant → 0 bits
      (2L, "a b c d", "en", "s"),          // uniform distinct → log2(4) = 2
      (3L, "a a b b", "en", "s")           // two symbols, balanced → 1 bit
    ).toDF("doc_id", "text", "lang", "source")
    val e = graft.text.TextOps.tokenEntropy(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(e(1L) == 0.0)
    assert(e(2L) == 2.0)
    assert(e(3L) == 1.0)
  }

  // one event per (day, i), ts in long nanos as the events table carries
  private def eventsWithCounts(countsByDay: Seq[Long]) =
    countsByDay.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => (d.toLong * 86400000000000L + i * 1000000L, i))
    }.toDF("ts", "i")

  test("cusum: prefix-sum form == the direct max(0, ...) recursion") {
    val counts = Seq(100L, 90L, 110L, 100L, 250L, 260L, 240L, 30L, 20L, 100L)
    val got = graft.quality.Drift.cusumDailyCounts(eventsWithCounts(counts))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the textbook recursion, same integer micro-unit arithmetic
    val tot = counts.sum
    val mu = tot * 1000000L / counts.length
    val slack = mu * 10L / 100L
    var (cu, cd) = (0L, 0L)
    val want = counts.zipWithIndex.map { case (c, d) =>
      cu = math.max(0L, cu + (c * 1000000L - mu - slack))
      cd = math.max(0L, cd + (mu - slack - c * 1000000L))
      (d.toLong, c, cu, cd)
    }
    assert(got.toSeq == want)
  }

  test("sourceScoreKs equals the brute-force one-vs-rest CDF scan (q226)") {
    import spark.implicits._
    // scores: web {1000000, 500000, 0}, books {500000, 250000}
    val d = Seq(
      (1L, "the a of", "web"),        // 3/3 stop -> 1000000
      (2L, "the a zz qq", "web"),     // 2/4 -> 500000
      (3L, "xx yy zz qq", "web"),     // 0/4 -> 0
      (4L, "of in ww ee", "books"),   // 2/4 -> 500000
      (5L, "a xx yy zz", "books"),    // 1/4 -> 250000
      (6L, "", "books")               // empty -> excluded
    ).toDF("doc_id", "text", "source")
    val scores = Map(1L -> 1000000L, 2L -> 500000L, 3L -> 0L,
      4L -> 500000L, 5L -> 250000L)
    val srcOf = Map(1L -> "web", 2L -> "web", 3L -> "web",
      4L -> "books", 5L -> "books")
    val grid = scores.values.toSeq.distinct.sorted
    def brute(s: String): (Long, Long) = {
      val in = scores.collect { case (id, v) if srcOf(id) == s => v }.toSeq
      val out = scores.collect { case (id, v) if srcOf(id) != s => v }.toSeq
      grid.map { t =>
        val ci = in.count(_ <= t).toLong
        val co = out.count(_ <= t).toLong
        (math.abs(ci * out.size - co * in.size), t)
      }.maxBy { case (num, t) => (num, -t) } // ties -> lowest score
    }
    val rows = graft.quality.Drift.sourceScoreKs(d).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("books", "web"))
    rows.foreach { r =>
      val s = r.getString(0)
      val (num, at) = brute(s)
      assert(r.getAs[Long]("n_in") == srcOf.values.count(_ == s).toLong)
      assert(r.getAs[Long]("n_out") == srcOf.size.toLong - r.getAs[Long]("n_in"))
      assert(r.getAs[Long]("ks_num") == num, s"$s ks_num")
      assert(r.getAs[Long]("score_at") == at, s"$s score_at")
      assert(r.getAs[Long]("ks_ppm") ==
        num * 1000000L / (r.getAs[Long]("n_in") * r.getAs[Long]("n_out")))
    }
  }

  test("mannKendall equals the brute-force pair sweep (q224)") {
    val counts = Seq(100L, 90L, 110L, 100L, 250L, 260L, 240L, 30L, 100L, 100L)
    val r = graft.quality.Drift
      .mannKendallDailyCounts(eventsWithCounts(counts)).collect().head
    val pairs = for (i <- counts.indices; j <- counts.indices if i < j)
      yield java.lang.Long.signum(counts(j) - counts(i))
    assert(r.getAs[Long]("n_days") == counts.size.toLong)
    assert(r.getAs[Long]("n_pos") == pairs.count(_ > 0).toLong)
    assert(r.getAs[Long]("n_neg") == pairs.count(_ < 0).toLong)
    assert(r.getAs[Long]("n_tie") == pairs.count(_ == 0).toLong)
    assert(r.getAs[Long]("s_stat") == pairs.map(_.toLong).sum)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") +
      r.getAs[Long]("n_tie") == counts.size.toLong * (counts.size - 1) / 2)
  }

  test("mannKendall: degenerate 1-day input reads exact zeros, not NULLs") {
    val r = graft.quality.Drift
      .mannKendallDailyCounts(eventsWithCounts(Seq(42L))).collect().head
    assert(r.getAs[Long]("n_days") == 1L)
    Seq("n_pos", "n_neg", "n_tie", "s_stat", "trend_sign").foreach { c =>
      assert(!r.isNullAt(r.fieldIndex(c)), s"$c must not be NULL")
      assert(r.getAs[Long](c) == 0L, s"$c must be 0")
    }
  }

  test("mannKendall: strictly increasing series reads S = n(n-1)/2, sign +1") {
    val n = 8
    val r = graft.quality.Drift
      .mannKendallDailyCounts(eventsWithCounts((1L to n).map(_ * 10L)))
      .collect().head
    assert(r.getAs[Long]("s_stat") == n.toLong * (n - 1) / 2)
    assert(r.getAs[Long]("trend_sign") == 1L && r.getAs[Long]("n_neg") == 0L)
  }

  test("cusum: constant series never accumulates or flags") {
    val out = graft.quality.Drift.cusumDailyCounts(eventsWithCounts(Seq.fill(12)(50L)))
      .collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L && !r.getBoolean(4)))
  }

  test("winsorizedMeans: hand-checked clip on a tiny group") {
    // group g: values 0, 10, 10, 10, 1000 — p05/p95 land between the
    // extremes, so exactly the two tails clip
    val d = (Seq(0.0, 10.0, 10.0, 10.0, 1000.0).map(("g", _)) ++
      Seq(("h", 5.0), ("h", 7.0))).toDF("grp", "v")
    val r = graft.quality.Filters.winsorizedMeans(d, "grp", "v", 0.05, 0.95)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getLong(4), x.getLong(5), x.getDouble(6))).toMap
    val (n, lo, hi, cLo, cHi, mean) = r("g")
    assert(n == 5 && cLo == 1 && cHi == 1)
    assert(lo > 0.0 && lo < 10.0 && hi > 10.0 && hi < 1000.0)
    // clipped series = lo, 10, 10, 10, hi — exact 4dp arithmetic
    val want = BigDecimal((BigDecimal(lo) + 30 + BigDecimal(hi)).toDouble / 5)
    assert(math.abs(mean - want.toDouble) < 1e-9)
    // two-value group: interpolating p05/p95 of {5, 7} = 5.1/6.9, so
    // both endpoints clip inward and the winsorized mean stays 6.0
    assert(r("h") == ((2L, 5.1, 6.9, 1L, 1L, 6.0)))
  }

  test("quantileNormalize: bounds, monotonicity, single-member pin") {
    val d = Seq(("s1", 1L, 30L), ("s1", 2L, 10L), ("s1", 3L, 20L),
      ("s2", 9L, 99L)).toDF("src", "id", "v")
    val r = graft.ops.Windows.quantileNormalize(d, "src", col("v"), "v", "id")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(2L) == 0.0 && r(3L) == 0.5 && r(1L) == 1.0)
    assert(r(9L) == 0.0, "single-member group must pin to 0")
  }

  test("cusum: sustained level shift raises the flag") {
    val out = graft.quality.Drift
      .cusumDailyCounts(eventsWithCounts(Seq.fill(10)(100L) ++ Seq.fill(10)(300L)))
      .collect()
    assert(out.exists(_.getBoolean(4)), "shifted series must flag")
  }

  test("rolling z-score: spike flags against its trailing baseline, normal days don't") {
    // days 0-7 form a varied baseline; day 8 is a 10x spike; day 9 normal
    val counts = Seq(8L, 12L, 9L, 11L, 10L, 10L, 9L, 11L, 100L, 10L)
    val rows = graft.quality.Drift.rollingZScores(eventsWithCounts(counts))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getBoolean(6))).toMap
    // only days with a FULL 7-day baseline emit: 7, 8, 9
    assert(rows.keySet == Set(7L, 8L, 9L))
    val (cnt8, n8, s18, s28, z8, a8) = rows(8L)
    assert((cnt8, n8) == (100L, 7L))
    assert(s18 == counts.slice(1, 8).sum && s28 == counts.slice(1, 8).map(c => c * c).sum)
    // the exact formula, replayed in scala doubles, must match bit-for-bit
    val mean = s18.toDouble / n8.toDouble
    val varS = (s28.toDouble - s18.toDouble * s18 / n8) / (n8 - 1L).toDouble
    assert(z8 == (cnt8.toDouble - mean) / math.sqrt(varS))
    assert(a8, "10x spike must flag")
    assert(!rows(7L)._6 && !rows(9L)._6, "in-band days must not flag")
  }

  test("rolling z-score: zero-variance baselines are filtered, not NaN") {
    val out = graft.quality.Drift.rollingZScores(eventsWithCounts(Seq.fill(12)(50L)))
      .collect()
    assert(out.isEmpty, "constant baseline has undefined z and must emit nothing")
  }

  test("embedding drift: past the DECIMAL(38,0) envelope the op auto-switches " +
      "to the exact law on a deterministic hash subsample") {
    // 1000·d²·(n·2¹⁴)⁴ < 10³⁸ caps a 64-dim (label, half) at ~4286
    // vectors; past it the squared forms would overflow and non-ANSI
    // Spark would silently NULL the graded columns while the HUGEINT
    // oracle raises. r12 and earlier failed loudly there; r13 switches
    // automatically: the SAME law on the 1/k xxhash64(vec_id) sample —
    // so the fallback result must be bit-identical to embeddingDrift run
    // on the manually pre-filtered input (which is in-envelope and takes
    // the exact route), and just-below the bound must stay exact+non-null
    import graft.quality.Drift
    def emb(n: Long) = spark.range(n).select(
      (col("id") * 2).as("vec_id"), // even ids → all in half 0
      expr("transform(sequence(1, 64), j -> CAST(1.0 AS FLOAT))").as("embedding"),
      lit(1).as("label"))
    val big = emb(4300L)
    val fallback = Drift.embeddingDrift(big).collect().toSeq
    assert(fallback.length == 1, "fallback must still grade one row per label")
    val nSampled = fallback.head.getAs[Long]("n_a")
    assert(nSampled > 0L && nSampled < 4300L,
      s"fallback must have sampled (n_a = $nSampled)")
    // the modulus the fallback chose is deterministic — replay the choice
    val k = Drift.chooseDriftSampleMod(big, 4300L, 64L, Drift.DriftDecimalCap)
    assert(k > 1L && (k & (k - 1L)) == 0L, s"modulus must be a power of two: $k")
    // the route is surfaced row-locally: sample_mod carries the modulus
    // (not only a driver log line a downstream consumer can't see)
    assert(fallback.head.getAs[Long]("sample_mod") == k,
      s"sampled route must stamp sample_mod = $k")
    val manual = Drift.embeddingDrift(big.filter(Drift.driftSampleFilter(k)))
      .collect().toSeq
    assert(manual.head.getAs[Long]("sample_mod") == 1L,
      "the pre-filtered input is in-envelope, so its route is exact")
    def noRoute(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(r => r.toSeq.dropRight(1)) // all but the sample_mod stamp
    assert(noRoute(fallback) == noRoute(manual),
      s"fallback must equal the exact law on the same sample:\n$fallback\nvs\n$manual")
    // below the bound: exact route (no sampling — n_a is the FULL count)
    val ok = Drift.embeddingDrift(emb(4000L)).collect()
    assert(ok.length == 1 && !ok.head.isNullAt(ok.head.fieldIndex("na2_hi")),
      "below the bound the bilinear forms must grade non-null")
    assert(ok.head.getAs[Long]("n_a") == 4000L,
      "below the bound the exact route must see every vector")
    assert(ok.head.getAs[Long]("sample_mod") == 1L,
      "the exact route must stamp sample_mod = 1")
  }

  test("embedding drift: a lowered cap forces the sampling route through " +
      "the public wiring on a tiny fixture (envelope-parameter seam)") {
    import graft.quality.Drift
    val tiny = spark.range(64L).select(
      (col("id") * 2).as("vec_id"),
      expr("transform(sequence(1, 2), j -> CAST(0.5 AS FLOAT))").as("embedding"),
      lit(1).as("label"))
    val cap = BigInt(10).pow(25) // infeasible for 64 vectors of dim 2
    assert(!Drift.driftFeasible(64L, 2L, cap))
    val forced = Drift.embeddingDrift(tiny, cap).collect().toSeq
    val k = Drift.chooseDriftSampleMod(tiny, 64L, 2L, cap)
    assert(k > 1L, s"the lowered cap must force sampling (k = $k)")
    assert(forced.head.getAs[Long]("sample_mod") == k,
      s"seam-forced sampling must stamp sample_mod = $k")
    val manual = Drift.embeddingDrift(tiny.filter(Drift.driftSampleFilter(k)))
      .collect().toSeq
    def noRoute(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(r => r.toSeq.dropRight(1))
    assert(noRoute(forced) == noRoute(manual),
      s"seam-forced route must equal the exact law on the same sample")
    assert(forced.head.getAs[Long]("n_a") < 64L, "the sample must be proper")
    // and the default cap on the same fixture stays exact (sample_mod 1)
    val exact = Drift.embeddingDrift(tiny).collect().head
    assert(exact.getAs[Long]("n_a") == 64L)
    assert(exact.getAs[Long]("sample_mod") == 1L)
  }

  test("embedding drift: collinear halves read 1000, orthogonal 0, opposed -1000") {
    val emb = Seq(
      // label 1: identical directions across halves → cos² = 1 exactly
      (0L, Array(0.5f, 0.25f), 1),
      (1L, Array(0.5f, 0.25f), 1),
      // label 2: orthogonal halves → dot 0, sign 0
      (2L, Array(1.0f, 0.0f), 2),
      (3L, Array(0.0f, 1.0f), 2),
      // label 3: opposed collinear halves → sign -1, cos²·1000 = -1000
      (4L, Array(0.5f, 0.0f), 3),
      (5L, Array(-0.5f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val rows = graft.quality.Drift.embeddingDrift(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    def cos(l: Long) = rows(l).getAs[Long]("cos_sq_milli")
    def sign(l: Long) = rows(l).getAs[Long]("dot_sign")
    assert(cos(1L) == 1000L && sign(1L) == 1L)
    assert(cos(2L) == 0L && sign(2L) == 0L)
    assert(cos(3L) == -1000L && sign(3L) == -1L)
    // exact forms for label 1: s = floor(.5·2¹⁴)=8192, floor(.25·2¹⁴)=4096
    val (sa, sb) = (Seq(8192L, 4096L), Seq(8192L, 4096L))
    val dot = sa.zip(sb).map { case (a, b) => a * b }.sum
    assert(rows(1L).getAs[Long]("dot_hi") == dot / 4294967296L)
    assert(rows(1L).getAs[Long]("dot_lo") == dot % 4294967296L)
    assert(rows(1L).getAs[Long]("n_a") == 1L && rows(1L).getAs[Long]("n_b") == 1L)
  }
}

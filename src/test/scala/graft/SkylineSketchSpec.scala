package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Skyline, Tables}
import graft.text.HyperLogLog

/** Round-4 batch-4 curation screens: the 2-D Pareto frontier vs a local
  * O(n²) dominance oracle (random clouds + adversarial tie shapes), and
  * the HyperLogLog sketch's structural invariants — register bounds,
  * the merge-is-max identity on a split stream, and the accuracy the
  * p=8 error bound promises on the real corpus. Value-level grading is
  * the DuckDB oracle (q161/q162). */
class SkylineSketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def localFrontier(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, hi, lo) =>
      !pts.exists { case (_, h2, l2) =>
        h2 >= hi && l2 <= lo && (h2 > hi || l2 < lo)
      }
    }.toSet

  test("frontier2D matches the brute-force dominance oracle on a random cloud") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val got = Skyline.frontier2D(pts.toDF("id", "hi", "lo"), col("hi"), col("lo"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == localFrontier(pts))
    assert(got.nonEmpty)
  }

  test("frontier2D keeps exact ties and drops same-hi worse-lo rows") {
    val pts = Seq(
      (1L, 10L, 5L), (2L, 10L, 5L),          // exact tie: both kept
      (3L, 10L, 7L),                         // same hi, worse lo: dominated
      (4L, 12L, 5L),                         // dominates 1/2 on hi, tie lo
      (5L, 3L, 1L),                          // best lo, low hi: kept
      (6L, 3L, 2L))                          // dominated by 5
    val got = Skyline.frontier2D(pts.toDF("id", "hi", "lo"), col("hi"), col("lo"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(4L, 5L))
    assert(localFrontier(pts).map(_._1) == Set(4L, 5L))
  }

  test("frontier2D is idempotent and bucket-count-invariant") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong)).toDF("id", "hi", "lo")
    val f64 = Skyline.frontier2D(pts, col("hi"), col("lo"), 64)
    val f3 = Skyline.frontier2D(pts, col("hi"), col("lo"), 3)
    assert(f64.collect().toSet == f3.collect().toSet)
    val again = Skyline.frontier2D(f64, col("hi"), col("lo"))
    assert(again.collect().toSet == f64.collect().toSet)
  }

  test("docFrontier rows are mutually non-dominating and cover the maxima") {
    val rows = Skyline.docFrontier(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    for ((_, h1, l1) <- rows; (_, h2, l2) <- rows)
      assert(!(h2 >= h1 && l2 <= l1 && (h2 > h1 || l2 < l1)))
  }

  test("one-pass HLL Aggregator produces bit-identical registers to the declarative form") {
    // duplicated tokens + multiple groups + corpus text: the Aggregator
    // path must match registers() exactly, row for row
    val toks = ((1 to 800).map(i => (s"g${i % 4}", s"tok${i % 300}")) ++
      Seq(("g0", ""), ("g1", "x" * 40))) // domain-filtered rows
      .toDF("g", "token")
    val a = HyperLogLog.registers(toks, col("g")).orderBy("grp", "idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val b = HyperLogLog.registersOnePass(toks, col("g")).orderBy("grp", "idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    val docs = Tables.documents(spark, sf)
    val corpusToks = docs.select(col("source"), explode(split(col("text"), " ")).as("token"))
    val ca = HyperLogLog.registers(corpusToks, col("source")).orderBy("grp", "idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val cb = HyperLogLog.registersOnePass(corpusToks, col("source")).orderBy("grp", "idx")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ca == cb)
  }

  test("HLL registers: idx in [0,256), rank in [1,57], merge equals register-wise max") {
    val toks = (1 to 2000).map(i => (s"g${i % 3}", s"tok$i")).toDF("grp", "token")
      .withColumnRenamed("grp", "g")
    val per = HyperLogLog.registers(toks.select(col("g"), col("token")), col("g"))
    val regs = per.collect()
    assert(regs.nonEmpty)
    regs.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 256)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 57)
    }
    // sketch of the union stream == register-wise max of per-group sketches
    val union = HyperLogLog.registers(toks.select(lit("all").as("g"), col("token")), col("g"))
      .select(col("idx"), col("m")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxed = per.groupBy(col("idx")).agg(max(col("m")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(union == maxed)
  }

  test("HLL estimate lands within the p=8 error envelope on a large vocabulary") {
    // the raw estimator (no small-range correction — documented
    // portability choice) is only meaningful when n is not tiny vs
    // m=256, so accuracy is graded on a synthetic 4500-token corpus
    val docs = (0 until 150).map { i =>
      val toks = (0 until 30).map(j => s"w${i * 30 + j}")
      (i.toLong, s"s${i % 3}", toks.mkString(" "))
    }.toDF("doc_id", "source", "text")
    val rows = HyperLogLog.distinctTokensBySource(docs).collect()
    val bySrc = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getAs[Long]("est_milli"), r.getAs[Long]("exact_distinct"))).toMap
    assert(bySrc.keySet == Set("s0", "s1", "s2", "__union__"))
    assert(bySrc("__union__")._3 == 4500L)
    rows.foreach { r =>
      val (nz, est) = (r.getLong(1), r.getAs[Long]("est_milli") / 1000.0)
      val exact = r.getAs[Long]("exact_distinct")
      assert(nz >= 1 && nz <= 256)
      // 4× the 1.04/√m std error of the p=8 sketch
      assert(math.abs(est - exact) <= 4 * 1.04 / 16.0 * exact,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
    // merged registers: union nonzero count dominates every source's
    val unionNz = bySrc("__union__")._1
    assert(bySrc.filter(_._1 != "__union__").values.forall(_._1 <= unionNz))
  }

  test("weekly HLL: window merge equals the window's own sketch; exact counts pin the window") {
    // day d carries users [d·200, d·200+199] — disjoint across days, so
    // the trailing-7 exact count is 200·(covered days)
    val events = (0 until 10).flatMap { d =>
      (0 until 200).map(u => (d * 86400000000000L, d * 200L + u))
    }.toDF("ts", "user_id")
    val rows = HyperLogLog.weeklyDistinctUsers(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Long]("est_milli") / 1000.0,
        r.getAs[Long]("exact_distinct"))).toMap
    assert(rows.keySet == (0L to 9L).toSet)
    (0 to 9).foreach { d =>
      val covered = math.min(d, 6) + 1
      assert(rows(d.toLong)._3 == 200L * covered, s"day $d exact")
      // p=8 raw estimator envelope (4 sigma) on a 200-1400 cardinality
      val exact = 200.0 * covered
      assert(math.abs(rows(d.toLong)._2 - exact) <= 4 * 1.04 / 16.0 * exact + 60,
        s"day $d est=${rows(d.toLong)._2} exact=$exact")
    }
    // merge identity: day 9's window registers == direct sketch of its users
    val win9 = events.filter(col("ts") >= 3L * 86400000000000L)
      .select(lit(9L).as("g"), col("user_id").cast("string").as("token"))
    val direct = HyperLogLog.registers(win9, col("g"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val viaMergeNonzero = rows(9L)._1
    assert(direct.size.toLong == viaMergeNonzero,
      "merged nonzero register count must equal the window's own sketch")
  }

  test("HLL on the corpus: structure holds even at tiny vocabulary") {
    val rows = HyperLogLog.distinctTokensBySource(Tables.documents(spark, sf)).collect()
    assert(rows.length >= 2) // at least one source + __union__
    val bySrc = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.contains("__union__"))
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 256)
      // S rides as two BIGINT halves; reconstructed it is bounded by
      // the all-absent total 256·2^57 = 2^65, and s_lo is a true
      // mod-2^32 residue
      val (hi, lo) = (r.getAs[Long]("s_hi"), r.getAs[Long]("s_lo"))
      assert(lo >= 0L && lo < (1L << 32))
      assert((BigInt(hi) << 32) + BigInt(lo) <= (BigInt(256) << 57))
      assert(r.getAs[Long]("est_milli") > 0L)
    }
    assert(bySrc.filter(_._1 != "__union__").values.forall(_ <= bySrc("__union__")))
  }

  test("QuantileSketch: estimate brackets the exact order statistic; merge = union histogram") {
    import spark.implicits._
    import graft.quality.QuantileSketch
    val rnd = new scala.util.Random(5)
    val rows = (0 until 2000).map(i => (s"g${i % 3}", rnd.nextInt(900).toLong))
      .toDF("grp", "v")
    val width = 16L
    val q = QuantileSketch.quantiles(rows, col("grp"), col("v"), width, 64,
      Seq(100, 500, 900, 1000)).collect()
    assert(q.length == 12)
    q.foreach { r =>
      val (est, exact) = (r.getLong(2), r.getLong(3))
      // the sketch answers with the exact statistic's bucket upper bound
      assert(est >= exact && est - exact < width, s"$r")
    }
    // q=1000 must bracket the group max
    val maxes = rows.groupBy(col("grp")).agg(max(col("v"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.filter(_.getLong(1) == 1000L).foreach { r =>
      assert(r.getLong(3) == maxes(r.getString(0)))
    }
    // mergeability: histograms of two halves sum to the whole corpus histogram
    val (h1, h2) = (rows.filter(col("v") % 2 === 0), rows.filter(col("v") % 2 === 1))
    def hMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = hMap(QuantileSketch.merge(
      QuantileSketch.build(h1, col("grp"), col("v"), width, 64),
      QuantileSketch.build(h2, col("grp"), col("v"), width, 64)))
    val whole = hMap(QuantileSketch.build(rows, col("grp"), col("v"), width, 64))
    assert(merged == whole)
  }

  test("QuantileSketch: clamped top bucket answers an unbounded upper estimate") {
    import spark.implicits._
    import graft.quality.QuantileSketch
    // width*buckets = 16*64 = 1024 < 5000: the max clamps into the
    // last bucket, whose nominal upper edge (1023) would sit BELOW the
    // exact statistic — est_hi must go unbounded instead of lying
    val rows = ((0 until 50).map(_ => ("g", 100L)) :+ (("g", 5000L))).toDF("grp", "v")
    val q = QuantileSketch.quantiles(rows, col("grp"), col("v"), 16L, 64, Seq(500, 1000))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(q(1000L)._2 == 5000L, "exact max")
    assert(q(1000L)._1 == Long.MaxValue, "clamped bucket upper bound must be unbounded")
    assert(q(1000L)._1 >= q(1000L)._2)
    // interior quantiles keep the tight width-wide bracket
    assert(q(500L)._2 == 100L && q(500L)._1 >= 100L && q(500L)._1 - 100L < 16L)
  }

  test("QuantileSketch log form: 2x relative bracket on any domain; merge law holds") {
    import spark.implicits._
    import graft.quality.QuantileSketch
    val rnd = new scala.util.Random(17)
    // values spanning 8 orders of magnitude — the regime the equi-width
    // form cannot size buckets for without clamping
    val rows = (0 until 2000).map { i =>
      (s"g${i % 3}", math.abs(rnd.nextLong()) % (1L << (1 + rnd.nextInt(40)))) }
      .toDF("grp", "v")
    val q = QuantileSketch.logQuantiles(rows, col("grp"), col("v"),
      Seq(100, 500, 900, 1000)).collect()
    assert(q.length == 12)
    q.foreach { r =>
      val (est, exact) = (r.getLong(2), r.getLong(3))
      assert(est >= exact, s"est below exact: $r")
      assert(est < 2 * math.max(exact, 1L),
        s"relative error bound 2x violated: $r")
    }
    // mergeability: [[merge]] works verbatim on the log histogram
    val (h1, h2) = (rows.filter(col("v") % 2 === 0), rows.filter(col("v") % 2 === 1))
    def hMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = hMap(QuantileSketch.merge(
      QuantileSketch.buildLog(h1, col("grp"), col("v")),
      QuantileSketch.buildLog(h2, col("grp"), col("v"))))
    assert(merged == hMap(QuantileSketch.buildLog(rows, col("grp"), col("v"))))
    // v = 0 lands in bucket 0 with est_hi = 0 (exact)
    val z = QuantileSketch.logQuantiles(Seq(("z", 0L)).toDF("grp", "v"),
      col("grp"), col("v"), Seq(1000)).head()
    assert(z.getLong(2) == 0L && z.getLong(3) == 0L)
  }

  test("trailing log quantiles: merged histograms equal the direct window computation") {
    import spark.implicits._
    import graft.quality.QuantileSketch
    val rnd = new scala.util.Random(23)
    val data = (0 until 600).map(i => (100L + i % 10, // days 100..109
      math.abs(rnd.nextLong()) % (1L << (1 + rnd.nextInt(20)))))
    val df = data.toDF("day", "v")
    val got = QuantileSketch.trailingLogQuantiles(df, col("day"), col("v"),
        window = 3, qMillis = Seq(500, 1000)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.size == 20)
    (100L to 109L).foreach { d =>
      val win = data.filter(t => t._1 >= d - 2 && t._1 <= d)
      val exp = QuantileSketch.logQuantiles(
          win.toDF("day", "v").select(lit(d).as("g"), col("v")),
          col("g"), col("v"), Seq(500, 1000)).collect()
        .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      Seq(500L, 1000L).foreach { q =>
        assert(got((d, q)) == exp(q),
          s"day $d q$q: merged ${got((d, q))} != direct ${exp(q)}")
      }
    }
  }

  test("Bloom: no false negatives, merge equals union sketch, probe matches referee bits") {
    import spark.implicits._
    val toks = (0 until 200).map(i => (s"s${i % 2}", s"tok$i")).toDF("source", "token")
    val blooms = graft.text.Bloom.buildPerGroup(toks, col("source"))
    val byGrp = blooms.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    assert(byGrp.keySet == Set("s0", "s1") && byGrp.values.forall(_.length == 64))
    // referee: recompute expected bit array per group
    def refBits(tokens: Seq[String]): Array[Long] = {
      val buf = new Array[Long](64)
      tokens.foreach { t =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
        graft.functions.Sketches.bloomPositions(h).foreach(p => buf(p >>> 6) |= (1L << (p & 63)))
      }
      buf
    }
    assert(byGrp("s0").toSeq == refBits((0 until 200 by 2).map(i => s"tok$i")).toSeq)
    // merge = word-wise OR = sketch of the union stream
    val union = graft.text.Bloom.buildPerGroup(
      toks.select(lit("all").as("g"), col("token")), col("g"))
      .collect().head.getSeq[Long](1).toArray
    assert(union.toSeq == byGrp("s0").zip(byGrp("s1")).map { case (a, b) => a | b }.toSeq)
    // probe: every inserted token hits (no false negatives), absent
    // tokens answer exactly what the referee bits say
    val probes = ((0 until 200).map(i => s"tok$i") ++ (0 until 50).map(i => s"no$i"))
      .toDF("token")
    val hits = graft.text.Bloom.probe(blooms, probes).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    (0 until 200).foreach { i =>
      assert(hits((s"s${i % 2}", s"tok$i")), s"inserted tok$i must hit its own filter")
    }
    def refProbe(bits: Array[Long], t: String): Boolean = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
      graft.functions.Sketches.bloomPositions(h)
        .forall(p => ((bits(p >>> 6) >> (p & 63)) & 1L) == 1L)
    }
    hits.foreach { case ((g, t), hit) => assert(hit == refProbe(byGrp(g), t), s"$g/$t") }
  }

  test("presentation estimates: est_raw tracks est_milli; linear counting fixes small range") {
    val docs = (0 until 150).map { i =>
      val toks = (0 until 30).map(j => s"w${i * 30 + j}")
      (i.toLong, s"s${i % 3}", toks.mkString(" "))
    }.toDF("doc_id", "source", "text")
    val big = HyperLogLog.withEstimates(HyperLogLog.distinctTokensBySource(docs)).collect()
    big.foreach { r =>
      val raw = r.getAs[Double]("est_raw")
      // est_milli is exactly floor(1000·est_raw) up to the double's own ulp
      assert(math.abs(r.getAs[Long]("est_milli") - math.floor(1000.0 * raw)) <= 1.0)
      // far above 5m/2 = 640 the correction must be a no-op
      if (raw > 640.0) assert(r.getAs[Double]("est_corrected") == raw)
    }
    // tiny vocabulary: raw biases high, linear counting lands near exact
    val tiny = (0 until 40).map(i => (i.toLong, "s0", s"tok${i % 31}"))
      .toDF("doc_id", "source", "text")
    val row = HyperLogLog.withEstimates(HyperLogLog.distinctTokensBySource(tiny))
      .filter(col("source") === "s0").collect().head
    val (raw, corr, exact) = (row.getAs[Double]("est_raw"),
      row.getAs[Double]("est_corrected"), row.getAs[Long]("exact_distinct"))
    assert(exact == 31L)
    assert(corr < raw, "small-range correction must pull the high-biased raw estimate down")
    assert(math.abs(corr - exact) < math.abs(raw - exact),
      s"corrected $corr should beat raw $raw against exact $exact")
  }
}

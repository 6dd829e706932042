package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Theta
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.ops.Tables

/** Round-7 additions: KMV/theta sketch, C4 boilerplate scrub, and the
  * decode→resize / decode→frame-feature multimodal stages. Value-level
  * grading is the DuckDB oracle (q180–q184); these specs pin the
  * engine-side invariants the oracle can't see — aggregator/composed
  * equality, merge laws, and the codec arithmetic. */
class ThetaScrubSpec extends AnyFunSuite {
  import TestSpark._

  private def xx64(s: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
  }

  /** Reference KMV: distinct hashes, flipped, sorted, first k. */
  private def refKmv(tokens: Seq[String], k: Int): Seq[Long] =
    tokens.map(t => xx64(t) ^ Long.MinValue).distinct.sorted.take(k)

  test("KMV aggregator equals the sort-distinct-take-k reference, duplicates absorbed") {
    import spark.implicits._
    val words = (0 until 500).map(i => s"tok${i % 137}") // heavy duplication
    val got = words.toDF("token")
      .agg(Theta.kmvAgg(col("token")).as("kmv"))
      .head().getSeq[Long](0)
    assert(got == refKmv(words, Theta.K))
    // sorted ascending and distinct — the sketch's structural contract
    assert(got == got.distinct.sorted)
  }

  test("KMV merge law: sketch of a union == merged sketches of the parts") {
    val agg = new Theta.KmvAgg(16)
    val left = Seq("a", "b", "c", "dup", "e").foldLeft(agg.zero)(agg.reduce)
    val right = Seq("dup", "x", "y", "z").foldLeft(agg.zero)(agg.reduce)
    val whole = Seq("a", "b", "c", "dup", "e", "x", "y", "z")
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(left, right).toSeq == whole.toSeq)
  }

  test("property: KMV merge law on random partitioned token sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(300, Gen.chooseNum(0, 400).map(i => s"t$i"))
    (0 until 6).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))
      .grouped(2).foreach { case Seq(xs) => () // odd tail — skip
        case Seq(xs, ys) =>
          val agg = new Theta.KmvAgg(32)
          val merged = agg.merge(
            xs.foldLeft(agg.zero)(agg.reduce),
            ys.foldLeft(agg.zero)(agg.reduce))
          val whole = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
          assert(merged.toSeq == whole.toSeq,
            "merge(sketch(A), sketch(B)) must equal sketch(A ++ B)")
          assert(merged.toSeq == refKmv(xs ++ ys, 32),
            "and both must equal the sort-distinct-take-k reference")
      }
  }

  test("KMV estimate: exhaustive below k, within 3 RSE of truth when full") {
    import spark.implicits._
    // 40 distinct < K = 64: sketch is exhaustive, est is exact (×1000)
    val small = (0 until 40).map(i => ("g", s"s$i")).toDF("grp", "token")
    val smallEst = Theta.withEstimates(
        small.groupBy(col("grp")).agg(Theta.kmvAgg(col("token")).as("kmv")))
      .head()
    assert(smallEst.getAs[Long]("est_milli") == 40000L)
    assert(smallEst.getAs[Any]("kth_f") == null)
    // 5000 distinct >> K: estimate within 3·RSE ≈ 3/√62 ≈ 38%
    val big = (0 until 5000).map(i => ("g", s"b$i")).toDF("grp", "token")
    val est = Theta.withEstimates(
        big.groupBy(col("grp")).agg(Theta.kmvAgg(col("token")).as("kmv")))
      .head().getAs[Long]("est_milli")
    assert(est > 5000000L * 62 / 100 && est < 5000000L * 138 / 100,
      s"est_milli $est vs truth 5000000")
  }

  test("theta intersection: common-below-theta counts bounded and exact when exhaustive") {
    import spark.implicits._
    val a = (0 until 30).map(i => ("a", s"shared$i")) ++
      (0 until 10).map(i => ("a", s"onlya$i"))
    val b = (0 until 30).map(i => ("b", s"shared$i")) ++
      (0 until 5).map(i => ("b", s"onlyb$i"))
    val sk = Theta.buildPerGroup((a ++ b).toDF("source", "token"), col("source"))
    val row = Theta.intersections(sk).head()
    // both sketches exhaustive (40, 35 < 64) ⇒ no theta, exact overlap
    assert(row.getAs[Any]("theta_f") == null)
    assert(row.getAs[Long]("n_common") == 30L)
    assert(row.getAs[Long]("inter_est_milli") == 30000L)
  }

  test("theta set algebra: exact on exhaustive sketches; Jaccard is the count ratio") {
    import spark.implicits._
    val a = (0 until 30).map(i => ("a", s"shared$i")) ++
      (0 until 10).map(i => ("a", s"onlya$i"))
    val b = (0 until 30).map(i => ("b", s"shared$i")) ++
      (0 until 5).map(i => ("b", s"onlyb$i"))
    val sk = Theta.buildPerGroup((a ++ b).toDF("source", "token"), col("source"))
    val row = Theta.setAlgebra(sk).head()
    assert(row.getAs[Any]("theta_f") == null)
    assert(row.getAs[Long]("n_common") == 30L)
    assert(row.getAs[Long]("n_only_a") == 10L)
    assert(row.getAs[Long]("n_only_b") == 5L)
    assert(row.getAs[Long]("diff_a_est_milli") == 10000L)
    assert(row.getAs[Long]("union_est_milli") == 45000L)
    assert(row.getAs[Long]("jaccard_milli") == 30000L / 45L) // 666
  }

  test("theta chain at non-default k: estimate and set algebra equal the brute reference") {
    // the full graded chain (build → estimate → set algebra) run at
    // k = 16 against a from-scratch Scala reference — proves the
    // sketch size is genuinely parameterized: the estimator numerator
    // is 1000·(k−1)·2⁶⁴ computed from the sketch's OWN k (a K=64
    // constant here would mis-scale by 15/63), the k-th-minimum
    // column, the θ cut, and every scaled count follow k
    import spark.implicits._
    val k = 16
    val a = (0 until 60).map(i => ("a", s"sh$i")) ++
      (0 until 140).map(i => ("a", s"oa$i"))
    val b = (0 until 60).map(i => ("b", s"sh$i")) ++
      (0 until 90).map(i => ("b", s"ob$i"))
    val sk = Theta.buildPerGroup((a ++ b).toDF("source", "token"), col("source"), k)
    val bA = refKmv(a.map(_._2), k)
    val bB = refKmv(b.map(_._2), k)
    def unsignedOf(f: Long) = BigInt(f) + (BigInt(1) << 63)
    def estMilli(kth: Long): Long =
      ((BigInt(1000) * (k - 1) * (BigInt(1) << 64)) / unsignedOf(kth)).toLong
    val est = Theta.withEstimates(sk, k).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(est("a").getAs[Long]("kth_f") == bA.last)
    assert(est("a").getAs[Long]("est_milli") == estMilli(bA.last))
    assert(est("b").getAs[Long]("est_milli") == estMilli(bB.last))

    val row = Theta.setAlgebra(sk, k).head()
    val theta = math.min(bA.last, bB.last)
    assert(row.getAs[Long]("theta_f") == theta)
    val belowA = bA.filter(_ < theta).toSet
    val belowB = bB.filter(_ < theta).toSet
    val nc = (belowA & belowB).size.toLong
    val nu = (belowA ++ belowB).size.toLong
    assert(row.getAs[Long]("n_common") == nc)
    assert(row.getAs[Long]("n_only_a") == (belowA -- belowB).size.toLong)
    assert(row.getAs[Long]("n_only_b") == (belowB -- belowA).size.toLong)
    def scaled(n: Long): Long =
      ((BigInt(n) * 1000 * (BigInt(1) << 64)) / unsignedOf(theta)).toLong
    assert(row.getAs[Long]("union_est_milli") == scaled(nu))
    assert(row.getAs[Long]("diff_a_est_milli") ==
      scaled((belowA -- belowB).size.toLong))
    assert(row.getAs[Long]("jaccard_milli") == nc * 1000 / nu)
  }

  test("theta set algebra agrees with intersections under sampling (small k)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val a = (0 until 300).map(_ => ("a", s"t${rnd.nextInt(400)}"))
    val b = (0 until 300).map(_ => ("b", s"t${rnd.nextInt(400) + 150}"))
    val sk = Theta.buildPerGroup((a ++ b).toDF("source", "token"), col("source"), k = 16)
    val alg = Theta.setAlgebra(sk, k = 16).head()
    val inter = Theta.intersections(sk, k = 16).head()
    // the sampled-region cut is shared, so the two operators' common
    // counts and thetas must be identical
    assert(alg.getAs[Long]("n_common") == inter.getAs[Long]("n_common"))
    assert(alg.getAs[Long]("theta_f") == inter.getAs[Long]("theta_f"))
    // the three disjoint counts tile the sampled union
    val u = alg.getAs[Long]("n_common") + alg.getAs[Long]("n_only_a") +
      alg.getAs[Long]("n_only_b")
    assert(alg.getAs[Long]("jaccard_milli") == alg.getAs[Long]("n_common") * 1000 / u)
  }

  test("property: set algebra matches a brute theta-formula reference") {
    import spark.implicits._
    val k = 8
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 4) {
      val na = 5 + rnd.nextInt(40)
      val nb = 5 + rnd.nextInt(40)
      val domain = 60
      val ta = Seq.fill(na)(s"w${rnd.nextInt(domain)}").distinct
      val tb = Seq.fill(nb)(s"w${rnd.nextInt(domain)}").distinct
      val df = (ta.map(("a", _)) ++ tb.map(("b", _))).toDF("source", "token")
      val row = graft.text.Theta.setAlgebra(
        graft.text.Theta.buildPerGroup(df, col("source"), k = k), k = k).head()
      // brute reference straight from the definitions
      val (sa, sb) = (refKmv(ta, k), refKmv(tb, k))
      val theta: Option[Long] =
        (Option.when(sa.length == k)(sa.last), Option.when(sb.length == k)(sb.last)) match {
          case (Some(x), Some(y)) => Some(math.min(x, y))
          case (x, y)             => x.orElse(y)
        }
      val cut = (s: Seq[Long]) => theta.fold(s)(t => s.filter(_ < t))
      val (ba, bb) = (cut(sa).toSet, cut(sb).toSet)
      assert(row.getAs[Long]("n_common") == (ba & bb).size.toLong, s"trial $trial common")
      assert(row.getAs[Long]("n_only_a") == (ba -- bb).size.toLong, s"trial $trial onlyA")
      assert(row.getAs[Long]("n_only_b") == (bb -- ba).size.toLong, s"trial $trial onlyB")
      val u = (ba | bb).size.toLong
      val jac = if (u == 0) 0L else (ba & bb).size.toLong * 1000L / u
      assert(row.getAs[Long]("jaccard_milli") == jac, s"trial $trial jaccard")
      theta match {
        case None =>
          assert(row.getAs[Long]("union_est_milli") == u * 1000L)
        case Some(t) =>
          val thetaU = BigInt(t) + BigInt(2).pow(63) // back to unsigned
          val expect = (BigInt(u) * 1000 * BigInt(2).pow(64) / thetaU).toLong
          assert(row.getAs[Long]("union_est_milli") == expect, s"trial $trial union est")
      }
    }
  }

  test("image pHash: fingerprint matches the pixel-law replay; halves sub-2^32") {
    import spark.implicits._
    val docs = (0L until 31L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val rows = Multimodal.imagePHashDups(docs).collect()
    assert(rows.length == 11) // doc_id % 3 == 0
    // replay the law for one image: id=6, pw=14, ph=14, resized 8x8
    val id = 6L
    val (pw, ph) = (id % 48 + 8, id % 32 + 8)
    val lum = for (y <- 0 until 8; x <- 0 until 8)
      yield ((7 * (x * pw / 8) + 13 * (y * ph / 8) + id) % 256)
    val s = lum.sum
    var (hi, lo) = (0L, 0L)
    lum.zipWithIndex.foreach { case (l, i) =>
      if (64L * l > s) { if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32) }
    }
    val r6 = rows.find(_.getLong(0) == id).get
    assert(r6.getAs[Long]("hash_hi") == hi && r6.getAs[Long]("hash_lo") == lo)
    rows.foreach { r =>
      assert(r.getAs[Long]("hash_hi") >= 0 && r.getAs[Long]("hash_hi") < (1L << 32))
      assert(r.getAs[Long]("hash_lo") >= 0 && r.getAs[Long]("hash_lo") < (1L << 32))
      assert(r.getAs[Long]("n_dup") >= 0)
    }
  }

  test("boilerplate scrub removes every occurrence; clean docs unchanged") {
    import spark.implicits._
    val docs = Seq(
      (0L, "header line one alpha beta"),
      (1L, "header line one gamma delta"),
      (2L, "header line one epsilon zeta"),
      (3L, "eta theta iota kappa lambda"), // no boilerplate span
      (4L, "mu header line one nu")
    ).toDF("doc_id", "text")
    val out = Dedup.scrubBoilerplate(docs, 3, 3).collect()
    // "header line one" has df 4 >= 3: all 4 occurrences go (q86 would
    // have kept doc 0's); doc 3 is untouched
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toMap == Map(
      0L -> "alpha beta", 1L -> "gamma delta", 2L -> "epsilon zeta",
      3L -> "eta theta iota kappa lambda", 4L -> "mu nu"))
    assert(out.map(_.getAs[Long]("n_removed")).toSeq == Seq(3L, 3L, 3L, 0L, 3L))
  }

  test("boilerplate scrub: overlapping qualifying spans union their positions") {
    import spark.implicits._
    // "a b c d" in 3 docs: spans "a b c" and "b c d" both reach df 3,
    // their covered sets overlap on {b, c} — union, not double-count
    val docs = Seq((0L, "a b c d x"), (1L, "a b c d y"), (2L, "a b c d z"))
      .toDF("doc_id", "text")
    val out = Dedup.scrubBoilerplate(docs, 3, 3).collect()
    assert(out.map(_.getString(1)).toSeq == Seq("x", "y", "z"))
    assert(out.forall(_.getAs[Long]("n_removed") == 4L))
  }

  test("nearest-neighbor resize: exact source-index law, both directions") {
    val im = Multimodal.ImageCodec.synthesizePng(7L, 10, 6)
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(im))
    for ((tw, th) <- Seq((4, 4), (20, 3))) { // down- and up-scale
      val rz = Multimodal.ImageCodec.resizeNearest(src, tw, th)
      assert(rz.getWidth == tw && rz.getHeight == th)
      for (y <- 0 until th; x <- 0 until tw) {
        val g = ((7L * (x * 10 / tw) + 13L * (y * 6 / th) + 7L) % 256).toInt
        assert((rz.getRGB(x, y) & 0xFF) == g, s"($x,$y) of ${tw}x$th")
      }
    }
  }

  test("audio frame features: exact energy/positivity/extrema over decoded frames") {
    val id = 13L
    val n = Multimodal.audioSamples(id)
    val wav = Multimodal.AudioCodec.synthesizeWav(id, n)
    val samples = Multimodal.AudioCodec.decodeSamples(wav).get
    assert(samples.length == n)
    val rows = Multimodal.audioFrameFeatures(
        TestSpark.spark.range(id, id + 1).selectExpr("id AS doc_id", "'x' AS text"),
        64)
      .collect()
    assert(rows.length == n / 64)
    rows.foreach { r =>
      val f = r.getAs[Long]("frame_no").toInt
      val frame = samples.slice(f * 64, f * 64 + 64)
      assert(r.getAs[Long]("energy") == frame.map(v => v.toLong * v).sum)
      assert(r.getAs[Long]("n_pos") == frame.count(_ >= 0).toLong)
      assert(r.getAs[Long]("smax") == frame.max.toLong)
      assert(r.getAs[Long]("smin") == frame.min.toLong)
    }
  }
}

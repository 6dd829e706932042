package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Driver-side seeded Lloyd k-means for CODEBOOK-class training — a
  * centroid set is k×d floats, a statistic, not a dataset; training it
  * with distributed KMeans jobs costs more in job-launch overhead than
  * the arithmetic (measured: replacing m per-subspace ML fits in
  * PQ.pqBuild cut q92 from 9.2 s to 3.4 s at sf0.01). The corpus-side
  * work — assignment — stays fully distributed as a codegen'd argmin
  * expression over the centroid plan literal.
  *
  * Deterministic: seeded init, stable strict-< argmin tiebreak (lowest
  * index wins), empty clusters keep their previous center. Training
  * data is a BOUNDED sample ordered by portable content hash —
  * deterministic and unbiased, the FAISS practice for quantizer
  * training.
  */
object LocalKMeans {

  /** Seeded Lloyd iterations over dense points. */
  def fit(points: Array[Array[Double]], k: Int, iters: Int,
          seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "LocalKMeans.fit: empty sample")
    val rnd = new scala.util.Random(seed)
    val dim = points.head.length
    val centers = Array.tabulate(k)(_ => points(rnd.nextInt(points.length)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          var dd = 0.0; var t = 0
          while (t < dim) { val df = p(t) - centers(c)(t); dd += df * df; t += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        var t = 0
        while (t < dim) { sums(best)(t) += p(t); t += 1 }
        counts(best) += 1
      }
      for (c <- 0 until k if counts(c) > 0; t <- 0 until dim)
        centers(c)(t) = sums(c)(t) / counts(c)
    }
    centers
  }

  /** Collect a bounded hash-deterministic training sample of an
    * `array<float>` column ([[graft.ops.Scalar]]-class: bounded driver
    * bytes, one job). */
  def sampleVectors(df: DataFrame, vecCol: String, idCol: String,
                    maxRows: Int): Array[Array[Double]] =
    df.select(col(vecCol), md5(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h")).limit(maxRows)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))

  /** Distributed assignment as a mapPartitions batch: the SAME argmin
    * arithmetic as [[assignCol]] (float→double widening, t-ascending
    * accumulation, strict-< lowest-index tiebreak — bit-identical,
    * equality-tested in MLSpec) in tight JVM loops. Preferred for
    * BUILDS: the expression form inlines k·dim terms per row, which
    * (a) re-evaluates a DERIVED vector column's expression k·dim times
    * (measured: hours on a transform()-derived stress corpus) and
    * (b) outgrows whole-stage codegen at codebook sizes (k = 160
    * measured ~9× slower interpreted). Here the vector materializes
    * once per row into the object pipeline and the k·dim work is plain
    * doubles — O(n·k·dim) flops, the flat-quantizer cost every IVF
    * build pays (BLAS-shaped on a real cluster).
    * Input (id, vec) → (id, vec, cell). */
  def assignPartitions(df: DataFrame, idCol: String, vecCol: String,
                       centers: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = centers.length
    val dim = centers.head.length
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < k) {
            var dd = 0.0; var t = 0
            while (t < dim) {
              val d0 = v(t).toDouble - centers(c)(t); dd += d0 * d0; t += 1
            }
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          (id, v, best)
        }
      }.toDF(idCol, vecCol, "cell")
  }

  /** Nearest-center index for one point: the SAME arithmetic discipline
    * as every assignment path here (double accumulation in t-ascending
    * order, strict-< lowest-index tiebreak). */
  private[graft] def nearest(v: Array[Double], centers: Array[Array[Double]]): Int = {
    val k = centers.length; val dim = v.length
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < k) {
      var dd = 0.0; var t = 0
      while (t < dim) { val df = v(t) - centers(c)(t); dd += df * df; t += 1 }
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    best
  }

  /** Two-level (hierarchical) codebook: `coarse` top-level centers, one
    * sub-codebook per coarse cell, and the global-cell-id base of each
    * coarse cell. Global cell id = `offsets(c) + subIdx`; the id space is
    * exactly [0, nlist) so the SERVING side (flat centroid table,
    * partitioned assignments, nprobe probes) is identical to a flat
    * build's. */
  case class TwoLevelCodebook(coarse: Array[Array[Double]],
                              subs: Array[Array[Array[Double]]],
                              offsets: Array[Int]) {
    def nlist: Int = offsets.last + subs.last.length
    /** (globalCellId, center) pairs in cell-id order — the flat centroid
      * table the probe side broadcasts. */
    def flatCenters: Array[(Int, Array[Double])] =
      subs.iterator.zipWithIndex.flatMap { case (cs, c) =>
        cs.iterator.zipWithIndex.map { case (ctr, j) => (offsets(c) + j, ctr) }
      }.toArray
  }

  /** Two-level codebook fit — the LARGE-nlist build path. A flat Lloyd
    * fit is O(sample·nlist·dim·iters) on one driver thread and flat
    * assignment is O(n·nlist·dim); with nlist ∝ corpus (the SemDeDup
    * cell-size-held-constant law) both go quadratic. Here:
    *
    *  - a coarse fit at kc = ⌈√nlist⌉ runs driver-side (O(sample·√nlist));
    *  - each coarse cell's sub-codebook (k_c centers, Σk_c = nlist,
    *    allocated ∝ sample mass by deterministic largest-remainder) fits
    *    as ONE EXECUTOR TASK over that cell's sample points
    *    (`groupByKey(cell).mapGroups`) — the codebook fit is distributed
    *    across cells, not sequential on the driver;
    *  - assignment ([[assignTwoLevelPartitions]]) is argmin over kc
    *    coarse centers then over that cell's k_c sub-centers —
    *    O(n·(√nlist + maxₖ k_c)·dim), ~2√nlist per row for balanced cells.
    *
    * Deterministic end-to-end (the seeded bit-equality contract): the
    * sample is hash-ordered, the coarse fit is the seeded [[fit]], each
    * sub-fit sorts its cell's points by sample position and runs [[fit]]
    * with seed `seed ⊕ cell` — re-running the build reproduces every
    * center and every cell id bit-for-bit regardless of task placement. */
  def fitTwoLevel(spark: org.apache.spark.sql.SparkSession,
                  points: Array[Array[Double]], nlist: Int, iters: Int,
                  seed: Long): TwoLevelCodebook = {
    require(points.nonEmpty, "fitTwoLevel: empty sample")
    require(nlist >= 1, "fitTwoLevel: nlist must be >= 1")
    import spark.implicits._
    val kc = math.ceil(math.sqrt(nlist.toDouble)).toInt
    val coarse = fit(points, kc, iters, seed)
    val cellOf = points.map(nearest(_, coarse))
    val counts = new Array[Long](kc)
    cellOf.foreach(c => counts(c) += 1)
    // Sub-codebook sizes: one guaranteed center per coarse cell (keeps
    // the id space exactly nlist and every cell probe-able), the rest
    // allocated ∝ sample mass by largest remainder, ties to the lower
    // cell index — integer-deterministic.
    val extra = nlist - kc
    val total = points.length.toLong
    val kSub = Array.fill(kc)(1)
    if (extra > 0) {
      val quota = counts.map(c => c * extra.toLong)
      val base = quota.map(q => (q / total).toInt)
      var assignedExtra = base.sum
      for (c <- 0 until kc) kSub(c) += base(c)
      val byRem = (0 until kc).sortBy(c => (-(quota(c) % total), c))
      var i = 0
      while (assignedExtra < extra) {
        kSub(byRem(i % kc)) += 1; assignedExtra += 1; i += 1
      }
    }
    // Distributed per-cell sub-fits: one task per coarse cell.
    val kSubB = kSub
    val itersB = iters
    val withCell = points.zipWithIndex.map { case (p, i) => (cellOf(i), i, p.toSeq) }
    val fitted: Map[Int, Array[Array[Double]]] = spark
      .createDataset(withCell.toSeq)
      .groupByKey(_._1)
      .mapGroups { (c, it) =>
        val pts = it.toArray.sortBy(_._2).map(_._3.toArray)
        (c, fit(pts, kSubB(c), itersB, seed ^ (c.toLong + 0x9e3779b97f4a7c15L))
          .map(_.toSeq).toSeq)
      }
      .collect()
      .map { case (c, cs) => c -> cs.map(_.toArray).toArray }
      .toMap
    // An EMPTY coarse cell (no sample point mapped to it) still owns
    // kSub(c) global ids — pad with clones of the coarse center so the
    // id space stays exactly [0, nlist) (duplicate centers are harmless
    // under the strict-< lowest-index tiebreak; the duplicates simply
    // never win an argmin against the first copy).
    val subs = Array.tabulate(kc) { c =>
      fitted.getOrElse(c, Array.fill(kSub(c))(coarse(c).clone()))
    }
    val offsets = subs.scanLeft(0)(_ + _.length).dropRight(1)
    val cb = TwoLevelCodebook(coarse, subs, offsets)
    require(cb.nlist == nlist,
      s"fitTwoLevel: built ${cb.nlist} cells, requested $nlist")
    cb
  }

  /** Two-level assignment as a mapPartitions batch (same rationale and
    * arithmetic discipline as [[assignPartitions]]): argmin over the
    * coarse centers, then over that cell's sub-codebook; emitted cell is
    * the GLOBAL id. Input (id, vec) → (id, vec, cell). */
  def assignTwoLevelPartitions(df: DataFrame, idCol: String, vecCol: String,
                               cb: TwoLevelCodebook): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val dim = cb.coarse.head.length
        val buf = new Array[Double](dim)
        it.map { case (id, v) =>
          var t = 0
          while (t < dim) { buf(t) = v(t).toDouble; t += 1 }
          val c = nearest(buf, cb.coarse)
          val j = nearest(buf, cb.subs(c))
          (id, v, cb.offsets(c) + j)
        }
      }.toDF(idCol, vecCol, "cell")
  }

  /** Distributed assignment: argmin-of-squared-L2 over the centers
    * literal, as a codegen'd fold — the corpus never moves for a fit.
    * Fine for probe-side use at small k; builds should prefer
    * [[assignPartitions]] (see its scaladoc for the two measured
    * hazards of the inline-expression form). */
  def assignCol(vec: Column, centers: Array[Array[Double]]): Column = {
    val k = centers.length
    val dim = centers.head.length
    val cLit = typedlit(centers.map(_.toSeq).toSeq) // k × dim doubles
    aggregate(sequence(lit(0), lit(k - 1)),
      struct(lit(Double.MaxValue).as("dist"), lit(-1).as("idx")),
      (acc, c) => {
        val dd = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
          (s, t) => {
            val diff = element_at(vec, t + 1).cast("double") -
              element_at(element_at(cLit, c + 1), t + 1)
            s + diff * diff
          })
        when(dd < acc.getField("dist"),
          struct(dd.as("dist"), c.as("idx"))).otherwise(acc)
      },
      acc => acc.getField("idx"))
  }
}

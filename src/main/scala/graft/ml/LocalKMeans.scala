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

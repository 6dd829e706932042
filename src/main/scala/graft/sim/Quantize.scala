package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding columns — the storage/serving
  * compression step between raw float vectors and the PQ codes in
  * [[PQ]]: 4× smaller than float32 with near-lossless recall for most
  * retrieval workloads, and the format vector databases ship by default.
  *
  * Per-dimension affine quantization: code_t = round((x_t - lo_t) /
  * (hi_t - lo_t) * 255), clamped to [0, 255], where (lo_t, hi_t) are the
  * corpus-wide per-dimension extrema. The extrema pass is one
  * posexplode + hash aggregation (dim-sized result — a
  * [[graft.ops.Scalar]]-class reduction collected and re-broadcast as a
  * literal), and the encode itself is a single codegen'd `transform`
  * over the vector — a narrow map, no shuffle, embarrassingly parallel
  * at any corpus size.
  *
  * Everything after the extrema is engine-portable: min/max of float32
  * values are exact, the affine map is IEEE double arithmetic on exact
  * inputs, and `round` half-up on a [0,255]-range double is identical
  * across engines except on exact .5 boundaries, which the synthetic
  * corpus' 6-sig-digit floats never hit (oracle-checked at both SFs).
  */
object Quantize {

  /** Corpus per-dimension (lo, hi) as a driver literal: Seq of
    * (lo, hi) indexed by dimension. */
  def dimExtrema(embeddings: DataFrame, vecCol: String): Seq[(Double, Double)] =
    embeddings.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("pos"))
      .collect()
      .map(r => (r.getFloat(1).toDouble, r.getFloat(2).toDouble))
      .toSeq

  /** int8 codes for each vector (array<int> in [0,255]), plus exact
    * reconstruction-error stats. Output is compare-safe scalars:
    * (vec_id, sum_code, min_code, max_code, recon_err) — recon_err is
    * the L2 distance between the vector and its dequantization, per-dim
    * squared errors scaled to pico-units and summed as exact longs
    * (order-insensitive, the q77 discipline in its JIT-cheap long form;
    * headroom: round(d²·1e12) ≤ 4e12 per dim even for a value range of
    * ±500, so overflow needs >2M dims), one final sqrt.
    *
    * The encode runs ONCE into a materialized codes column — at corpus
    * scale the codes table IS the serving artifact — so the stats read
    * `codes` instead of re-inlining the fold per consumer (projection
    * collapse would otherwise quadruple the generated code; measured
    * 5.6 s → ~2 s on the bench line). */
  /** Session-scoped bounded LRU of the materialized encode, keyed by
    * (applicationId, input-plan semantic hash) — the
    * [[graft.dedup.Dedup.shinglesCached]] discipline: the code table
    * is a build-once/serve-many artifact, so a pipeline using both
    * [[codes]] and [[quantized]] over the same input pays the extrema
    * aggregation and the encode checkpoint ONCE. Bounded at 8 distinct
    * input plans; eviction is borrower-safe release-to-GC (Spark's
    * ContextCleaner unpersists the checkpoint blocks once no caller
    * holds the frame — see [[graft.ops.BoundedCache]]). Plan-hash
    * keying assumes IMMUTABLE inputs (the same contract) — a source
    * rewritten in place under the same plan must call
    * [[clearEncodeCache]]. */
  private val encodeCache = new graft.ops.BoundedCache[
    Int, (DataFrame, Seq[(Double, Double)])](maxEntries = 8)

  /** Explicit invalidation hook for in-place input rewrites. */
  def clearEncodeCache(): Unit = encodeCache.clear()

  /** The affine int8 encode materialized once: the input plus a
    * `codes` array<int> column, and the extrema the dequantization
    * needs. Shared by [[quantized]] and the coreset/selection
    * consumers ([[Coreset]]) so every user sees bit-identical codes —
    * and, via [[encodeCache]], computed once per (session, plan). */
  def encodedWithExtrema(embeddings: DataFrame): (DataFrame, Seq[(Double, Double)]) =
    encodeCache.getOrCompute(
      embeddings.sparkSession.sparkContext.applicationId,
      embeddings.semanticHash())(encodeUncached(embeddings))

  private def encodeUncached(embeddings: DataFrame): (DataFrame, Seq[(Double, Double)]) = {
    val extrema = dimExtrema(embeddings, "embedding")
    val lo = typedlit(extrema.map(_._1))
    val scale = typedlit(extrema.map { case (l, h) => if (h > l) 255.0 / (h - l) else 0.0 })
    val dims = extrema.length
    val codeAt = (i: org.apache.spark.sql.Column) =>
      least(greatest(
        round((element_at(col("embedding"), i).cast("double") - element_at(lo, i)) *
          element_at(scale, i), 0), lit(0.0)), lit(255.0)).cast("int")
    val idx = sequence(lit(1), lit(dims))
    (embeddings.withColumn("codes", transform(idx, i => codeAt(i)))
      .localCheckpoint(), extrema)
  }

  /** (vec_id, codes) — the int8 code table alone. */
  def codes(embeddings: DataFrame): DataFrame =
    encodedWithExtrema(embeddings)._1.select(col("vec_id"), col("codes"))

  def quantized(embeddings: DataFrame): DataFrame = {
    val (enc, extrema) = encodedWithExtrema(embeddings)
    val lo = typedlit(extrema.map(_._1))
    val inv = typedlit(extrema.map { case (l, h) => if (h > l) (h - l) / 255.0 else 0.0 })
    val dims = extrema.length
    val idx = sequence(lit(1), lit(dims))
    val err2 = aggregate(idx, lit(0L), (acc, i) => {
      val d = element_at(col("embedding"), i).cast("double") -
        (element_at(lo, i) + element_at(col("codes"), i).cast("double") * element_at(inv, i))
      acc + round(d * d * lit(1e12), 0).cast("long")
    })
    enc.select(col("vec_id"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c.cast("long")).as("sum_code"),
        array_min(col("codes")).cast("long").as("min_code"),
        array_max(col("codes")).cast("long").as("max_code"),
        round(sqrt(err2.cast("double") / lit(1e12)), 6).as("recon_err"))
      .orderBy(col("vec_id"))
  }
}

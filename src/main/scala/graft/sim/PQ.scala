package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: product-quantized ANN — the memory/bandwidth scale path.
  *
  * At corpus scale the float vectors themselves are the bottleneck: 100
  * TB of raw embeddings cannot be rescanned per query batch. Product
  * quantization stores each vector as `m` small codebook indices
  * (here m=4 bytes-ish vs 64 floats = 256 bytes — a ~64× scan-bandwidth
  * reduction); search scans CODES with a per-query lookup table and only
  * touches real vectors for the final exact re-rank of `refine`
  * candidates.
  *
  * Pipeline (all codegen'd HOFs over array columns — no UDF):
  *  - [[pqBuild]]: IVF coarse cells (reuses [[Similarity.ivfBuild]]'s
  *    KMeans) + per-subspace KMeans codebooks (m × ksub × d/m floats —
  *    driver-side tiny, shipped as a plan literal), + the encoded
  *    corpus (vec_id, cell, codes:array<int>). Vectors are encoded
  *    RAW (not residual-to-centroid): simpler, deterministic, and the
  *    exact re-rank absorbs the extra distortion; noted vs the
  *    residual-encoding variant of the published IVFADC scheme.
  *  - [[pqSearch]]: probe `nprobe` nearest cells (as IVF), score the
  *    probed cells' CODES via the query's LUT (asymmetric distance:
  *    dot(q_sub, codeword) summed over subspaces, on unit-normalized
  *    inputs ≈ cosine), keep top `refine` per query through the
  *    bounded-heap TopKPerKey operator, then exact-cosine re-rank only
  *    those against the true vectors.
  *
  * Determinism: KMeans is seeded; ADC ties break on vec_id; the final
  * ranking applies the same 6-dp round + id tiebreak as the exact kNN
  * operators.
  */
object PQ {

  /** codebooks(j)(c) = the c-th codeword of subspace j (d/m floats). */
  case class PqIndex(centroids: DataFrame, codes: DataFrame,
                     codebooks: Seq[Seq[Seq[Float]]], dim: Int)

  private def d(c: Column): Column = c.cast("double")

  /** Squared L2 between a subvector slice and a codeword literal. */
  private def subDist(vec: Column, cw: Column, start: Column, dsub: Int): Column =
    aggregate(sequence(lit(0), lit(dsub - 1)),
      lit(0.0),
      (acc, t) => {
        val diff = d(element_at(vec, start + t)) - d(element_at(cw, t + 1))
        acc + diff * diff
      })

  /** Train per-subspace codebooks and encode the corpus. `trainSample`
    * bounds the driver-collected training set (sampled by the portable
    * content hash, so the sample is deterministic and unbiased — the
    * classic PQ recipe; see [[graft.ml.LocalKMeans]]). */
  def pqBuild(corpus: DataFrame, nlist: Int = 16, m: Int = 4,
              ksub: Int = 16, trainSample: Int = 16384): PqIndex = {
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    // coarse quantizer (cells) — same build as IVF
    val ivf = Similarity.ivfBuild(corpus, nlist)
    // bounded, deterministic training sample → m local Lloyd fits
    val sample: Array[Array[Double]] = graft.ml.LocalKMeans.sampleVectors(
      corpus, "embedding", "vec_id", trainSample)
    val codebooks: Seq[Seq[Seq[Float]]] = (0 until m).map { j =>
      val sub = sample.map(_.slice(j * dsub, (j + 1) * dsub))
      graft.ml.LocalKMeans.fit(sub, ksub, iters = 10, seed = 42L + j)
        .toSeq.map(_.toSeq.map(_.toFloat))
    }
    val cbLit = typedlit(codebooks) // m × ksub × dsub plan literal
    // encode: codes[j] = argmin_c ||subvec_j - codebook[j][c]||² — a
    // nested HOF fold carrying (bestDist, bestIdx); strict < keeps the
    // lowest index on ties (deterministic).
    val codesCol = transform(sequence(lit(0), lit(m - 1)), j => {
      val start = j * dsub + 1
      aggregate(sequence(lit(0), lit(ksub - 1)),
        struct(lit(Double.MaxValue).as("dist"), lit(-1).as("idx")),
        (acc, c) => {
          val dist = subDist(col("ne"), element_at(element_at(cbLit, j + 1), c + 1),
            start, dsub)
          when(dist < acc.getField("dist"),
            struct(dist.as("dist"), c.as("idx"))).otherwise(acc)
        },
        acc => acc.getField("idx"))
    })
    val codes = ivf.assigned // (neighbor_id, ne, cell)
      .withColumn("codes", codesCol)
      .select(col("neighbor_id"), col("cell"), col("codes"))
    PqIndex(ivf.centroids, codes, codebooks, dim)
  }

  /** ADC search + exact re-rank. Output matches the kNN operators:
    * (query_id, neighbor_id, sim, rn). */
  def pqSearch(index: PqIndex, corpus: DataFrame, queries: DataFrame, k: Int,
               nprobe: Int = 4, refine: Int = 64): DataFrame = {
    val m = index.codebooks.length
    val ksub = index.codebooks.head.length
    val dsub = index.dim / m
    val cbLit = typedlit(index.codebooks)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // probe nprobe nearest cells, exactly as IVF
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    val probed = q.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", Similarity.cosineFast(col("qe"), col("centroid")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qe"), col("cell"))
    // per-query LUT: lut[j][c] = dot(q_subvec_j, codebook[j][c]) — m×ksub
    // doubles computed once per query row, broadcast with it.
    val lutCol = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(sequence(lit(0), lit(ksub - 1)), c =>
        aggregate(sequence(lit(0), lit(dsub - 1)), lit(0.0), (acc, t) =>
          acc + d(element_at(col("qe"), j * dsub + 1 + t)) *
            d(element_at(element_at(element_at(cbLit, j + 1), c + 1), t + 1)))))
    val withLut = probed.withColumn("lut", lutCol)
    // ADC: approximate dot = Σ_j lut[j][codes[j]] — scans only codes
    val adc = index.codes.join(broadcast(withLut), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, j) => acc +
          element_at(element_at(col("lut"), j + 1),
            element_at(col("codes"), j + 1) + 1)))
    // top `refine` ADC candidates per query via the bounded heap, then
    // exact re-rank of only those against the true vectors
    val cand = graft.plans.TopK.topKPerKey(
        adc.select(col("query_id"), col("neighbor_id"), col("adc")),
        Seq("query_id"), Seq(("adc", false), ("neighbor_id", true)), refine)
      .select(col("query_id"), col("neighbor_id"))
    val n = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.join(n, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("sim", round(Similarity.cosineFast(col("qe"), col("ne")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Build + search in one call (index reuse via [[pqBuild]] directly). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, nlist: Int = 16,
             m: Int = 4, ksub: Int = 16, nprobe: Int = 4,
             refine: Int = 64): DataFrame =
    pqSearch(pqBuild(corpus, nlist, m, ksub), corpus, queries, k, nprobe, refine)

  /** Persist a PQ index in its serving layout — the twin of
    * [[Similarity.ivfWriteIndex]]. CODES are partitioned by cell (the
    * scan-bandwidth artifact ADC reads); the raw vectors are
    * co-partitioned by cell so the exact re-rank of probed candidates
    * is also partition-pruned; centroids and codebooks (tiny) are plain
    * parquet. After this, serving never re-runs any KMeans fit. */
  def pqWriteIndex(index: PqIndex, corpus: DataFrame, path: String): Unit = {
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    graft.sources.Catalog.writePartitioned(index.codes, s"$path/codes", Seq("cell"))
    graft.sources.Catalog.writePartitioned(
      corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
        .join(index.codes.select(col("neighbor_id"), col("cell")), "neighbor_id"),
      s"$path/vectors", Seq("cell"))
    index.codebooks.zipWithIndex.flatMap { case (cws, j) =>
      cws.zipWithIndex.map { case (cw, c) => (j, c, cw, index.dim) }
    }.toDF("subspace", "code", "codeword", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** ADC search + exact re-rank against a persisted index. Identical
    * results to [[pqSearch]] on the same index (tested); the probed
    * cell set (bounded by nlist, a Scalar-class reduction) is applied
    * as a STATIC partition filter on BOTH the codes scan and the
    * vectors scan, so serving provably touches only the probed
    * inverted lists (PartitionFilters asserted in tests). */
  def pqSearchIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, k: Int, nprobe: Int = 4,
                      refine: Int = 64): DataFrame = {
    val cb = spark.read.parquet(s"$path/codebooks").collect()
    val dim = cb.head.getAs[Int]("dim")
    val byJc = cb.map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2)).toMap
    val m = cb.map(_.getInt(0)).max + 1
    val ksub = cb.map(_.getInt(1)).max + 1
    val codebooks: Seq[Seq[Seq[Float]]] =
      (0 until m).map(j => (0 until ksub).map(c => byJc((j, c))))
    val dsub = dim / m
    val cbLit = typedlit(codebooks)
    val centroids = spark.read.parquet(s"$path/centroids")
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", Similarity.cosineFast(col("qe"), col("centroid")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qe"), col("cell"))
    val cells = probed.select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq
    val lutCol = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(sequence(lit(0), lit(ksub - 1)), c =>
        aggregate(sequence(lit(0), lit(dsub - 1)), lit(0.0), (acc, t) =>
          acc + d(element_at(col("qe"), j * dsub + 1 + t)) *
            d(element_at(element_at(element_at(cbLit, j + 1), c + 1), t + 1)))))
    val withLut = probed.withColumn("lut", lutCol)
    val codes = spark.read.parquet(s"$path/codes").filter(col("cell").isin(cells: _*))
    val adc = codes.join(broadcast(withLut), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, j) => acc +
          element_at(element_at(col("lut"), j + 1),
            element_at(col("codes"), j + 1) + 1)))
    val cand = graft.plans.TopK.topKPerKey(
        adc.select(col("query_id"), col("neighbor_id"), col("adc")),
        Seq("query_id"), Seq(("adc", false), ("neighbor_id", true)), refine)
      .select(col("query_id"), col("neighbor_id"))
    val n = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(cells: _*))
      .select(col("neighbor_id"), col("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.join(n, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("sim", round(Similarity.cosineFast(col("qe"), col("ne")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Session-scoped index cache, same shape (and same appId-eviction
    * hygiene) as [[Similarity.ivfTopKCached]]: the 1 + m KMeans fits run
    * once per (session, corpus, params); cached tables are
    * localCheckpointed so a hit re-runs nothing; every serve re-applies
    * its own broadcast of the tiny centroid side. */
  private val pqCache =
    new graft.ops.BoundedCache[(String, Int, Int, Int), PqIndex](maxEntries = 8)

  def pqTopKCached(corpusKey: String, queries: DataFrame, corpus: DataFrame,
                   k: Int, nlist: Int = 16, m: Int = 4, ksub: Int = 16,
                   nprobe: Int = 4, refine: Int = 64): DataFrame = {
    val idx = pqCache.getOrCompute(
      corpus.sparkSession.sparkContext.applicationId, (corpusKey, nlist, m, ksub)) {
      val b = pqBuild(corpus, nlist, m, ksub)
      PqIndex(b.centroids.localCheckpoint(), b.codes.localCheckpoint(),
        b.codebooks, b.dim)
    }
    pqSearch(idx, corpus, queries, k, nprobe, refine)
  }
}

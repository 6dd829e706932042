package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting by content hash — the
  * reproducible sibling of `randomSplit` (SURVEY §2.7 W2) for
  * training-data pipelines: the same row lands in the same split on
  * every engine, every run, every cluster size, because the assignment
  * is a pure function of the row's id (+ salt), not of partitioning or
  * RNG state.
  *
  * Mechanics: the first 8 hex chars of `md5(id || '|' || salt)` are a
  * uniform 32-bit value; comparing against a fraction-scaled hex
  * threshold buckets rows with no shuffle at all (a narrow projection).
  * md5 hex is identical across engines, so the assignment is
  * oracle-checkable — unlike murmur3/xxhash which are engine-specific.
  */
object Sampling {

  /** First-8-hex-chars md5 bucket of (id, salt) — uniform over 2^32. */
  def hashBucketHex(id: Column, salt: String): Column =
    substring(md5(concat(id.cast("string"), lit("|" + salt))), 1, 8)

  /** Hex threshold such that P(bucket < threshold) ≈ frac. */
  def thresholdHex(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    f"${(frac * 0xFFFFFFFFL).toLong}%08x"
  }

  /** Add a deterministic train/test `split` column. */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                trainFrac: Double): DataFrame =
    df.withColumn("bucket", hashBucketHex(col(idCol), salt))
      .withColumn("split",
        when(col("bucket") < lit(thresholdHex(trainFrac)), "train")
          .otherwise("test"))

  /** Deterministic `frac` subsample (keep iff bucket under threshold). */
  def sampleByHash(df: DataFrame, idCol: String, salt: String,
                   frac: Double): DataFrame =
    df.filter(hashBucketHex(col(idCol), salt) < lit(thresholdHex(frac)))

  /** Deterministic n-per-stratum sample (equivalently: a per-key CAP —
    * the C4/RefinedWeb-style "at most n documents per domain" rule).
    * Rows within each stratum are ranked by the content hash of their
    * id (uniform, engine-portable md5), so the kept set is a uniform
    * without-replacement sample of the stratum that is identical on
    * every engine and cluster size; `rn` (1-based) is the sample index.
    *
    * Scale shape: routes through the custom [[graft.plans.TopKPerKey]]
    * operator — one shuffle of the narrow projection clustered by the
    * strata, an O(n) bounded heap per stratum, NO partition sort. A
    * window row_number would sort each stratum's full extent; a skewed
    * stratum (one domain = half the corpus) makes that sort the
    * straggler, while the heap stays O(n) regardless of skew. */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], idCol: String,
                       salt: String, n: Int): DataFrame = {
    val ranked = df.withColumn("__rk", hashBucketHex(col(idCol), salt))
    graft.plans.TopK.topKPerKey(ranked, strataCols,
        Seq(("__rk", true), (idCol, true)), n)
      .drop("__rk")
  }

  /** Domain-mixture sampling: keep each row with the probability its
    * group's weight prescribes — how a training corpus is re-weighted
    * to target proportions (web 30%, code 100%, …). Same determinism
    * contract as [[hashSplit]]: assignment is a pure function of
    * (id, salt), so the drawn mixture is reproducible across engines
    * and cluster sizes, and is oracle-checkable. The weights map is a
    * literal in the plan (domains are few); groups absent from it fall
    * back to `default`. Weight ≥ 1.0 keeps every row. Narrow
    * projection + filter — no shuffle, no RNG. */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String, salt: String,
                    weights: Map[String, Double], default: Double = 0.0): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0), "weights must be in [0,1]")
    // the fallback is a weight too: past 1.0 its 8-hex render would
    // silently truncate (the temperatureSample lpad hazard)
    require(default >= 0.0 && default <= 1.0, "default weight must be in [0,1]")
    val w = coalesce(
      element_at(typedlit(weights), col(groupCol)), lit(default))
    // per-row hex threshold, same scaling as thresholdHex
    val threshold = lpad(lower(hex(floor(w * lit(4294967295.0)).cast("long"))), 8, "0")
    df.filter(w >= 1.0 || hashBucketHex(col(idCol), salt) < threshold)
  }

  /** Exact integer floor-sqrt: floor(√n) with a ±1 correction step, so
    * the result is exact for any nonnegative long (< 2⁵²) regardless of
    * the double sqrt's final-ulp behavior — the portability trick that
    * lets √-shaped weights stay integer-gradable. */
  def isqrt(c: Column): Column = {
    val s0 = floor(sqrt(c.cast("double"))).cast("long")
    val s1 = when(s0 * s0 > c, s0 - 1L).otherwise(s0)
    when((s1 + 1L) * (s1 + 1L) <= c, s1 + 1L).otherwise(s1)
  }

  /** Temperature (α = 1/2) mixture resampling: output share per group
    * ∝ √n_g — the standard flattening that keeps small domains from
    * drowning (α = 1 is proportional, α = 0 uniform). Per-doc keep
    * fraction is K/√n_g with K = √n_min (the smallest group keeps
    * everything; downsampling only — no replication).
    *
    * Everything graded is exact-integer: weights are [[isqrt]] values,
    * the per-group threshold is one integral division
    * t_g = 2³²·isqrt(n_min) div isqrt(n_g), and the keep test is the
    * [[mixtureSample]] md5-hex compare against t_g's fixed-width hex —
    * deterministic, engine-portable, shuffle-free on the corpus side
    * (group counts broadcast back as a tiny table). */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        salt: String): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__isq", isqrt(col("__n")))
    // isqrt is monotone, so min(isqrt) = isqrt(min n): one Scalar action
    val isqMin = counts.agg(min(col("__isq"))).head().getLong(0)
    // For __isq == isqMin the division yields exactly 2^32, whose hex
    // is 9 chars — an unclamped lpad(..., 8) would TRUNCATE it to
    // "00000000" (a 0% keep rate). The least() clamp to 2^32-1 keeps
    // every threshold inside 8 hex chars structurally; min-weight
    // groups are unaffected because the `__isq <= isqMin` disjunct
    // below keeps them wholesale before the hex compare runs (the
    // oracle clamps identically).
    val thr = lpad(lower(hex(
      expr(s"least((4294967296L * ${isqMin}L) div __isq, 4294967295L)"))), 8, "0")
    df.join(broadcast(counts), groupCol)
      .filter(col("__isq") <= isqMin || hashBucketHex(col(idCol), salt) < thr)
      .drop("__n", "__isq")
  }

  /** Deterministic per-epoch training order: each epoch re-ranks the
    * corpus by `md5(id | salt : epoch)` — a fresh uniform permutation
    * per epoch that is a pure function of (id, salt, epoch), so the
    * exact training order any worker sees is reproducible across
    * engines, runs, and cluster sizes (the md5 discipline of
    * [[hashSplit]] applied to ORDER instead of membership).
    *
    * Global positions are computed WITHOUT a single-partition window
    * over data rows: the first hex byte of the rank hash is a uniform
    * 256-way bucket; per-(epoch, bucket) counts give broadcast
    * offsets (a window over ≤256·epochs rows), and positions are
    * offset + bucket-local row_number — the two-phase global-numbering
    * shape of [[graft.ops.Windows.globalRunningSum]], with the bucket
    * boundaries free because the hash is uniform by construction.
    * Output: (epoch, pos, id) with pos 1-based within its epoch. */
  def epochShuffle(df: DataFrame, idCol: String, salt: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"need epochs >= 1, got $epochs")
    import org.apache.spark.sql.expressions.Window
    val ranked = df
      .select(col(idCol), explode(sequence(lit(0L), lit(epochs - 1L))).as("epoch"))
      .withColumn("rk", substring(md5(concat(col(idCol).cast("string"),
        lit("|" + salt + ":"), col("epoch").cast("string"))), 1, 8))
      .withColumn("__b", substring(col("rk"), 1, 2))
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("epoch"), col("__b"))
      .orderBy(col("rk"), col(idCol))
    val wOff = Window.partitionBy(col("epoch")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranked.groupBy(col("epoch"), col("__b")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("epoch"), col("__b"), col("__off"))
    ranked
      .withColumn("__rn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("epoch", "__b"))
      .select(col("epoch"), (col("__off") + col("__rn")).as("pos"), col(idCol))
      .orderBy(col("epoch"), col("pos"))
  }

  /** Per-ROW weighted Bernoulli keep — [[mixtureSample]]'s continuous
    * generalization: each row survives with probability `weight`
    * (clamped to [0,1]), decided by the same deterministic md5 draw on
    * (id, salt). This is quality-weighted curation (keep good documents
    * with higher probability) as a pure narrow projection + filter —
    * no shuffle, no RNG state, reproducible across engines and cluster
    * sizes. */
  def weightedSample(df: DataFrame, idCol: String, salt: String,
                     weight: Column): DataFrame = {
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    val threshold = lpad(lower(hex(floor(w * lit(4294967295.0)).cast("long"))), 8, "0")
    df.filter(w >= 1.0 || hashBucketHex(col(idCol), salt) < threshold)
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** KMV/theta sketches over per-group token streams — the SET-ALGEBRA
  * sketch completing the mergeable family ([[HyperLogLog]] distinct,
  * [[CountMin]] frequency, [[Bloom]] membership, [[HeavyHitters]]
  * top-k): a k-minimum-values sample of the hash space (Bar-Yossef et
  * al. 2002; Dasu et al.'s theta-sketch framing) supports not just
  * distinct ESTIMATES but estimated set INTERSECTIONS across groups —
  * the question HLL union cannot answer ("how much does src_a's
  * shingle set overlap src_b's?") at sketch cost instead of a
  * corpus-pairwise join.
  *
  * Determinism: the sketch CONTENT is the k smallest Spark seed-42
  * xxhash64 values of the group's distinct tokens under UNSIGNED
  * order — a pure function of the token set, no randomness — so every
  * graded column (k-th minimum, estimate, pairwise overlap counts) is
  * exactly replayable by the DuckDB xxhash64 CTE chain. Values are
  * stored sign-FLIPPED (u − 2⁶³ as a signed long) so plain signed
  * comparisons give unsigned order on both engines.
  *
  * Estimator, in exact integer arithmetic (no double anywhere, the
  * q162 portability rule): with u_k the k-th smallest unsigned hash,
  *   est_milli = 1000·(k−1)·2⁶⁴ div u_k
  * (the classic unbiased (k−1)/u_k KMV estimator, ×1000, floored); a
  * sketch holding fewer than k values is exhaustive, so est_milli =
  * 1000·n exactly. For an (a,b) pair with θ = min(u_k(a), u_k(b)):
  *   inter_est_milli = 1000·|{v ∈ A∩B : v < θ}|·2⁶⁴ div θ
  * — both one integral division of DECIMAL(38,0) integers.
  *
  * Scale shape: build is ONE aggregation whose map-side partials are
  * ≤ 8·k-byte sorted arrays (k = 64 ⇒ 512 bytes per (partition,
  * group) on the exchange, the Bloom/HLL shape); merge is a sorted
  * merge keeping k; pairwise intersection runs over the TINY sketch
  * table (one row per group) with broadcast array arithmetic — the
  * corpus is never joined against itself.
  */
object Theta {
  /** Sketch size: 64 values ⇒ ~1/√(k−2) ≈ 13% relative standard
    * error on distinct estimates — the demo size; production sizes to
    * the error budget (k = 1024 ⇒ ~3%). */
  val K = 64

  /** 2⁶³ as decimal — the flip offset back to unsigned. */
  private val Flip = "9223372036854775808"
  /** 1000·(k−1)·2⁶⁴ exactly, as the decimal literal the graded
    * integral division consumes — computed from the SKETCH'S OWN k
    * (a K=64 constant here would silently mis-scale every non-default
    * sketch's estimate by (k−1)/63). */
  private def estNum(k: Int): String =
    (BigInt(1000) * (k - 1) * (BigInt(1) << 64)).toString

  private def domain(c: Column): Column = length(c) > 0 && length(c) < 32

  /** One-pass KMV sketch: buffer is the sorted (signed order ==
    * unsigned order after the flip) array of DISTINCT flipped hashes,
    * capped at k. Duplicate tokens are absorbed by the binary-search
    * membership test — KMV is a SET sketch, so insertion must be
    * idempotent (a duplicated hash would shift u_k downward and bias
    * the estimate high). */
  class KmvAgg(k: Int) extends Aggregator[String, Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.empty[Long]

    private def insert(buf: Array[Long], f: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, f)
      if (pos >= 0) return buf // already present
      val ins = -pos - 1
      if (ins >= k) return buf // larger than the current k minima
      val n = math.min(buf.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = f
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
      out
    }

    def reduce(buf: Array[Long], token: String): Array[Long] = {
      val u = UTF8String.fromString(token)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
      insert(buf, h ^ Long.MinValue)
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted distinct merge keeping the k smallest
      val out = new Array[Long](math.min(a.length + b.length, k))
      var (i, j, n) = (0, 0, 0)
      while (n < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (j < b.length && b(j) == v) j += 1 // collapse duplicates
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `kmv_agg(tokenCol)` → sorted array<bigint> of ≤ K
    * flipped hashes. */
  def kmvAgg(token: Column, k: Int = K): Column = udaf(new KmvAgg(k)).apply(token)

  /** One KMV sketch per group from a (grp via `grp`, token) stream,
    * tokens outside the shared oracle domain excluded (same rule as
    * [[HyperLogLog.registers]] / [[Bloom.buildPerGroup]]). */
  def buildPerGroup(tokens: DataFrame, grp: Column, k: Int = K): DataFrame =
    tokens
      .filter(domain(col("token")))
      .groupBy(grp.as("grp"))
      .agg(kmvAgg(col("token"), k).as("kmv"))

  /** Graded per-group estimate columns, exact-integer only:
    * (grp, n_sketch, kth_f, est_milli). kth_f is the k-th minimum as
    * its flipped signed BIGINT (NULL while the sketch is exhaustive);
    * est_milli = 1000·(k−1)·2⁶⁴ div (kth_f + 2⁶³) for a full sketch,
    * 1000·n_sketch exactly otherwise. */
  def withEstimates(sketches: DataFrame, k: Int = K): DataFrame =
    sketches
      .withColumn("n_sketch", size(col("kmv")).cast("long"))
      .withColumn("kth_f",
        when(col("n_sketch") === k, element_at(col("kmv"), k)))
      .withColumn("est_milli",
        when(col("kth_f").isNull, col("n_sketch") * 1000L)
          .otherwise(expr(s"CAST(CAST('${estNum(k)}' AS DECIMAL(38,0)) div " +
            s"(CAST(kth_f AS DECIMAL(38,0)) + CAST('$Flip' AS DECIMAL(38,0))) AS BIGINT)")))

  /** Pairwise theta intersection over the sketch table itself (a < b
    * lexicographically): θ is the smaller survival threshold, the
    * common values below θ are a uniform hash-space sample of the
    * true intersection, and the estimate scales them back by 2⁶⁴/θ.
    * The join input is one row per GROUP — broadcast of the smaller
    * side is automatic at any corpus scale; only array arithmetic
    * (codegen'd higher-order functions) runs per pair.
    * Returns (grp_a, grp_b, theta_f, n_common, inter_est_milli). */
  def intersections(sketches: DataFrame, k: Int = K): DataFrame = {
    val a = sketches.select(col("grp").as("grp_a"), col("kmv").as("kmv_a"))
    val b = sketches.select(col("grp").as("grp_b"), col("kmv").as("kmv_b"))
    // broadcast the (one-row-per-group) right side: the `<` pairing
    // becomes a BroadcastNestedLoopJoin over the tiny sketch table —
    // never a shuffled cartesian, at any corpus scale
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      // θ_f: min of the two k-th minima when both sketches are full;
      // an exhaustive sketch imposes no threshold (θ = 2⁶⁴ ⇒ f-domain
      // max), so θ falls back to the other side's — or none at all,
      // in which case the "estimate" is the exact common count.
      .withColumn("theta_f", least(
        when(size(col("kmv_a")) === k, element_at(col("kmv_a"), k)),
        when(size(col("kmv_b")) === k, element_at(col("kmv_b"), k))))
      .withColumn("common", when(col("theta_f").isNull,
          array_intersect(col("kmv_a"), col("kmv_b")))
        .otherwise(filter(array_intersect(col("kmv_a"), col("kmv_b")),
          v => v < col("theta_f"))))
      .withColumn("n_common", size(col("common")).cast("long"))
      .withColumn("inter_est_milli",
        when(col("theta_f").isNull, col("n_common") * 1000L)
          .otherwise(expr("CAST((CAST(n_common AS DECIMAL(38,0)) * 1000 * " +
            "CAST('18446744073709551616' AS DECIMAL(38,0))) div " +
            s"(CAST(theta_f AS DECIMAL(38,0)) + CAST('$Flip' AS DECIMAL(38,0))) AS BIGINT)")))
      .select(col("grp_a"), col("grp_b"), col("theta_f"),
        col("n_common"), col("inter_est_milli"))
  }

  /** Full pairwise set algebra over the sketch table: intersection,
    * A-not-B / B-not-A differences, union and Jaccard — the remaining
    * theta-framework estimators on top of [[intersections]].
    *
    * Soundness of the difference counts: θ ≤ u_k(B) means every hash
    * of B's SET below θ is present in B's SKETCH (KMV keeps the k
    * smallest, and θ never exceeds the k-th), so "in A's sketch below
    * θ and absent from B's sketch" is an EXACT membership test on the
    * sampled region — the survivors are a uniform hash-space sample
    * of the true A∖B, scaled back by 2⁶⁴/θ like the intersection.
    * Jaccard needs no scaling at all: both |A∩B| and |A∪B| are
    * sampled at the SAME rate θ/2⁶⁴, so the count ratio
    * 1000·n_common div n_union is already the estimate (Beyer et al.
    * 2007's KMV Jaccard) — one exact integral division, no 2⁶⁴
    * numerator, no double.
    *
    * Same scale shape as [[intersections]]: a broadcast nested-loop
    * pairing of the one-row-per-group sketch table with codegen'd
    * array arithmetic per pair; the corpus is never self-joined.
    * Returns (grp_a, grp_b, theta_f, n_common, n_only_a, n_only_b,
    * diff_a_est_milli, union_est_milli, jaccard_milli). */
  def setAlgebra(sketches: DataFrame, k: Int = K): DataFrame = {
    val estOf = (n: String) =>
      when(col("theta_f").isNull, col(n) * 1000L)
        .otherwise(expr(s"CAST((CAST($n AS DECIMAL(38,0)) * 1000 * " +
          "CAST('18446744073709551616' AS DECIMAL(38,0))) div " +
          s"(CAST(theta_f AS DECIMAL(38,0)) + CAST('$Flip' AS DECIMAL(38,0))) AS BIGINT)"))
    sketches.select(col("grp").as("grp_a"), col("kmv").as("kmv_a"))
      .join(broadcast(
          sketches.select(col("grp").as("grp_b"), col("kmv").as("kmv_b"))),
        col("grp_a") < col("grp_b"))
      .withColumn("theta_f", least(
        when(size(col("kmv_a")) === k, element_at(col("kmv_a"), k)),
        when(size(col("kmv_b")) === k, element_at(col("kmv_b"), k))))
      .withColumn("below", // sampled-region cut, shared by all three counts
        when(col("theta_f").isNull, col("kmv_a"))
          .otherwise(filter(col("kmv_a"), v => v < col("theta_f"))))
      .withColumn("below_b",
        when(col("theta_f").isNull, col("kmv_b"))
          .otherwise(filter(col("kmv_b"), v => v < col("theta_f"))))
      .withColumn("n_common",
        size(array_intersect(col("below"), col("below_b"))).cast("long"))
      .withColumn("n_only_a",
        size(array_except(col("below"), col("below_b"))).cast("long"))
      .withColumn("n_only_b",
        size(array_except(col("below_b"), col("below"))).cast("long"))
      .withColumn("n_union", col("n_common") + col("n_only_a") + col("n_only_b"))
      .withColumn("diff_a_est_milli", estOf("n_only_a"))
      .withColumn("union_est_milli", estOf("n_union"))
      .withColumn("jaccard_milli",
        when(col("n_union") === 0L, lit(0L))
          .otherwise(expr("CAST((n_common * 1000) div n_union AS BIGINT)")))
      .select(col("grp_a"), col("grp_b"), col("theta_f"),
        col("n_common"), col("n_only_a"), col("n_only_b"),
        col("diff_a_est_milli"), col("union_est_milli"), col("jaccard_milli"))
  }
}

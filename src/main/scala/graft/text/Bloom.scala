package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom membership filters over per-group token streams — the
  * MEMBERSHIP sketch completing the mergeable-sketch family
  * ([[HyperLogLog]] distinct, [[CountMin]] frequency,
  * [[HeavyHitters]] top-k). m = 4096 bits, k = 3 double-hashed
  * positions from one Spark xxhash64 seed-42 hash
  * ([[graft.functions.Sketches.bloomPositions]]), so the filter
  * CONTENT — every set bit — is exactly replayable by the DuckDB
  * xxhash64 chain, and so is every probe answer including the false
  * positives (a Bloom filter's false positives are a deterministic
  * function of the bit array, not noise).
  *
  * The 100 TB use-case is decontamination-style membership at serving
  * cost: "is this benchmark n-gram anywhere in the corpus?" answered
  * against 512 bytes per group instead of a join against the corpus —
  * and per-shard/per-day filters OR together into the corpus filter
  * without a re-scan (the merge IS the aggregation, same as the other
  * sketches). False-positive rate at m/n = 4096/1000, k = 3 is ~1.5%;
  * size m to the group's expected distinct count in production.
  *
  * Scale shape: build is ONE aggregation whose map-side partials are
  * 512-byte buffers; probe is a broadcast join of the tiny filter
  * table against the probe stream with pure integer bit arithmetic —
  * no shuffle of the corpus anywhere.
  */
object Bloom {
  val M = 4096L

  private def domain(c: Column): Column = length(c) > 0 && length(c) < 32

  /** One 4096-bit filter per group from a (grp via `grp`, token)
    * stream. Tokens outside the shared oracle domain (empty or ≥32
    * chars) are excluded, same as [[HyperLogLog.registers]]. */
  def buildPerGroup(tokens: DataFrame, grp: Column): DataFrame =
    tokens
      .filter(domain(col("token")))
      .groupBy(grp.as("grp"))
      .agg(graft.functions.Sketches.bloomAgg(col("token")).as("bloom"))

  /** Probe every group's filter with every probe token:
    * (grp, token, bloom_hit). The k bit tests are plain integer
    * expressions over the broadcast filter row — h1/h2/positions
    * mirror [[graft.functions.Sketches.bloomPositions]] verbatim. */
  def probe(blooms: DataFrame, probes: DataFrame): DataFrame = {
    val h = xxhash64(col("token"))
    val withPos = probes
      .filter(domain(col("token")))
      .select(col("token"),
        shiftrightunsigned(h, 32).as("h1"),
        h.bitwiseAND(lit(0xFFFFFFFFL)).as("lo"))
      .withColumn("h2", col("lo") + 1L - col("lo") % 2L)
    val probed = withPos.crossJoin(broadcast(blooms))
    // (word >> bit) & 1 reads bit p regardless of arithmetic sign
    // extension (only bits above 63−bit are affected)
    // Spark SQL bracket indexing is 0-based (element_at is the 1-based one)
    val hit = (0 until 3).map { i =>
      expr(s"((bloom[CAST(((h1 + $i * h2) % 4096) DIV 64 AS INT)] " +
        s">> CAST(((h1 + $i * h2) % 4096) % 64 AS INT)) & 1) = 1")
    }.reduce(_ && _)
    probed
      .withColumn("bloom_hit", hit)
      .select(col("grp"), col("token"), col("bloom_hit"))
  }
}

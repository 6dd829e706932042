package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingestion — the stream twin of the batch admission
  * path (`dedup/Dedup.incrementalDedup`): documents arrive continuously,
  * are fingerprinted, and duplicates are dropped in-stream.
  *
  * State is one fingerprint per distinct document inside the lateness
  * horizon, watermark-evicted, so it stays bounded no matter how long
  * the stream runs. Dedup across horizons (against the full historical
  * corpus) is the batch job's responsibility — the standard
  * stream/batch split for corpus ingestion at scale.
  *
  * At production state sizes set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `RocksDBStateStoreProvider` (off-heap, spillable — the in-memory
  * HDFS-backed default holds every fingerprint on-heap); StreamingSpec
  * runs this pipeline on RocksDB to prove the env supports it.
  */
object CorpusStream {

  /** Expects a streaming DataFrame with (doc_id, text, ingest_ts).
    * Emits the first arrival of each distinct (normalized) text within
    * the watermark; later copies — same batch or later batches — drop. */
  def ingestDedup(docs: DataFrame, lateness: String = "1 hour"): DataFrame =
    docs.withColumn("fp", graft.text.TextOps.fingerprint(col("text")))
      .withWatermark("ingest_ts", lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming admission gate: every micro-batch is checked against the
    * SAME [[graft.quality.Expectations]] rules the batch pipeline uses
    * (one rule library, both planes — the T2 principle applied to data
    * quality). A batch that passes every rule goes to `accept`; a batch
    * with any violation goes WHOLE to `reject` (quarantine-and-replay
    * beats admitting a poisoned batch, and keeps the gate idempotent
    * under checkpoint-retry). Rule evaluation is the same single-pass
    * hash agg as the batch gate — per batch it reduces to a handful of
    * driver booleans, never a collect of the data.
    *
    * Returns the started query (checkpointed at `checkpoint`). */
  def gatedSink(docs: DataFrame, rules: Seq[graft.quality.Expectations.Rule],
                checkpoint: String)(
      accept: DataFrame => Unit, reject: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val failed = graft.quality.Expectations.check(batch, rules)
            .filter(!col("passed")).limit(1).count() > 0
          if (failed) reject(batch) else accept(batch)
        }
      }
      .start()
}

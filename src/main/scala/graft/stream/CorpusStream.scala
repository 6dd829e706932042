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
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star component; builder prompt).
  *
  * Image/audio/video payloads are opaque `binary` columns with typed
  * metadata, processed per-partition in batches — the Scala analogue of
  * `mapInPandas`: `Dataset.mapPartitions` over a typed row, so decode
  * libraries amortize initialization per partition and the exchange is
  * Tungsten-encoded rows, not driver round trips.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[DecodeStub.decode]] is a deterministic fake keyed on
  * the payload bytes. Everything around it — schema, partitioning,
  * batch shape, the feature-vector contract — is real and tested, so a
  * production decoder drops in by replacing ONE function.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)

  /** Decoded features: fixed-width embedding + extracted dims. */
  case class MediaFeatures(media_id: Long, kind: String,
                           feature: Array[Float], out_width: Int, out_height: Int)

  /** ======== STUB BOUNDARY ========
    * Deterministic fake decoder: derives a FeatureDim-float vector from
    * the payload bytes (splitmix64 over a rolling hash). Replace with a
    * real codec (e.g. JPEG decode + CNN embed) — signature and batch
    * shape are the contract. */
  object DecodeStub {
    val FeatureDim = 16
    def decode(payload: Array[Byte]): Array[Float] = {
      var h = 0x9E3779B97F4A7C15L
      payload.foreach { b => h = (h ^ b) * 0xBF58476D1CE4E5B9L; h ^= (h >>> 27) }
      val out = new Array[Float](FeatureDim)
      var s = h
      var i = 0
      while (i < FeatureDim) {
        s += 0x9E3779B97F4A7C15L
        var z = s; z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL; z = z ^ (z >>> 31)
        out(i) = (z.toDouble / Long.MaxValue.toDouble).toFloat
        i += 1
      }
      out
    }
  }

  /** Batched per-partition decode + feature extraction (the mapInPandas
    * analogue). The resize is metadata arithmetic (real); the pixel work
    * is inside the stub. */
  def decodeFeatures(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would live here (codec contexts, model handles)
      rows.map { r =>
        val feat = DecodeStub.decode(r.payload)
        // aspect-preserving resize arithmetic — real, codec-independent
        val scale = math.min(targetW.toDouble / math.max(r.width, 1),
          targetH.toDouble / math.max(r.height, 1))
        MediaFeatures(r.media_id, r.kind, feat,
          math.max(1, (r.width * scale).toInt), math.max(1, (r.height * scale).toInt))
      }
    }
  }

  /** Frame sampling for video-kind rows: every `everyMs` milliseconds,
    * one (media_id, frame_no, ts_ms) row — pure plan arithmetic
    * (explode over a computed sequence), no decode involved. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("ts_ms"))
      .withColumn("frame_no", (col("ts_ms") / everyMs).cast("long"))
      .select(col("media_id"), col("frame_no"), col("ts_ms"))

  /** Synthesize a media table from the documents fixture: text bytes as
    * opaque payload with deterministic metadata — exercises the binary
    * column path end-to-end without real codecs. */
  def synthesizeFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        (col("n_chars") * 100).cast("long").as("duration_ms"))
      .as[MediaRow]
  }
}

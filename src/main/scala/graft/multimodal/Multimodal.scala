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
  * The IMAGE path is a real codec: [[ImageCodec.decode]] reads the
  * payload with the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP — no
  * external library), takes width/height from the DECODED bitmap (not
  * the metadata, which at corpus scale routinely lies), and extracts a
  * 16-bin integer-luma histogram feature. Audio/video remain STUBBED
  * ([[DecodeStub.decode]], a deterministic fake keyed on payload
  * bytes): the JDK ships no usable audio/video codec, and the stub
  * keeps the batch shape + feature contract real so a production
  * decoder drops in by replacing ONE function.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, duration_ms: Long)

  /** Decoded features: fixed-width embedding + extracted dims. */
  case class MediaFeatures(media_id: Long, kind: String,
                           feature: Array[Float], out_width: Int, out_height: Int)

  /** Real image codec on the JDK only. Luma is integer ITU-R BT.601
    * ((299R + 587G + 114B) / 1000) so the histogram is exact-arithmetic
    * and engine-portable; the feature is the 16-bin histogram
    * normalized by pixel count. */
  object ImageCodec {
    val FeatureDim = 16

    /** Deterministic grayscale test card g(x,y) = (7x + 13y + seed) mod
      * 256, PNG-encoded — the synthesized fixture that lets the decode
      * path be oracle-checked (PNG is lossless, so the decoded luma
      * histogram is pure arithmetic over (seed, w, h)). */
    def synthesizePng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((7L * x + 13L * y + seed) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode → (real width, real height, normalized luma histogram).
      * Returns None when the payload is not a decodable image (the
      * corpus-scale reality: truncated files, mislabeled kinds) —
      * callers choose quarantine vs fallback, the codec never throws. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        catch { case _: java.io.IOException => None }
      img.map { im =>
        val w = im.getWidth
        val h = im.getHeight
        val counts = new Array[Long](FeatureDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF)) / 1000
            counts(luma >> 4) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        (w, h, counts.map(c => (c.toDouble / n).toFloat))
      }
    }
  }

  /** ======== STUB BOUNDARY (audio/video only) ========
    * Deterministic fake decoder: derives a FeatureDim-float vector from
    * the payload bytes (splitmix64 over a rolling hash). Replace with a
    * real codec (e.g. ffmpeg-backed frame/sample decode) — signature and
    * batch shape are the contract. Images use [[ImageCodec]], which is
    * real. */
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
    * analogue). Image rows go through the REAL codec — dimensions come
    * from the decoded bitmap (falling back to metadata only if the
    * payload doesn't decode); audio/video go through the stub. */
  def decodeFeatures(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would live here (codec contexts, model handles)
      rows.map { r =>
        val (w, h, feat) =
          if (r.kind == "image")
            ImageCodec.decode(r.payload)
              .getOrElse((r.width, r.height, DecodeStub.decode(r.payload)))
          else (r.width, r.height, DecodeStub.decode(r.payload))
        // aspect-preserving resize arithmetic — real, codec-independent
        val scale = math.min(targetW.toDouble / math.max(w, 1),
          targetH.toDouble / math.max(h, 1))
        MediaFeatures(r.media_id, r.kind, feat,
          math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
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

  /** Synthesize a media table from the documents fixture. Image rows
    * carry a REAL (deterministic) PNG payload with small pixel dims —
    * doc_id-keyed test cards, so the whole encode→decode→histogram path
    * runs for real and is oracle-checkable; audio/video rows keep text
    * bytes as opaque payload with deterministic metadata. */
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
      .mapPartitions(_.map { r =>
        if (r.kind == "image") {
          val pw = (r.media_id % 48 + 8).toInt
          val ph = (r.media_id % 32 + 8).toInt
          r.copy(payload = ImageCodec.synthesizePng(r.media_id, pw, ph),
            width = pw, height = ph)
        } else r
      })
  }
}

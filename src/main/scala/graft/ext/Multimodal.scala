package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** X5 — multimodal (image/audio/video) columns for training-data pipelines
  * (SURVEY §2.8).
  *
  * Design: media travels as an opaque `binary` column plus typed metadata
  * (uri, mime, size). Heavy per-item work (decode, resize, feature extract,
  * frame sample) runs batched per partition via `mapPartitions` — the Scala
  * analog of Python's `mapInPandas`: one iterator per task, amortized setup
  * (a real codec would be opened once per partition, not per row), pipelined
  * with the scan. At 100 TB the bytes column is only materialized inside the
  * partition task; plans that only touch metadata prune it at the parquet
  * reader.
  *
  * Codec bindings: PNG/JPEG/BMP/GIF decode (and PNG/JPEG encode /
  * thumbnail resize) are REAL, via the JRE's `javax.imageio`, and WAV
  * audio decode (and encode / PCM RMS features) is REAL via
  * `javax.sound.sampled` — bytes are sniffed by magic number (JPEG =
  * FF D8 FF, covering JFIF and EXIF) and routed to the right codec, so
  * parquet columns of actual PNG/JPEG/WAV files round-trip with true geometry,
  * pixel/PCM checksums, and RMS features. Formats the JRE cannot decode
  * (JPEG-XL, video codecs) fall back to the deterministic synthetic-header
  * codec ([[SyntheticMedia]]) so the pipeline shape stays exercisable
  * offline; swap those arms of [[MediaCodec]] for real bindings (e.g.
  * a JNI ffmpeg wrapper) to take them to production.
  */
object Multimodal {

  /** Typed media row: the engine-native multimodal column layout. */
  final case class MediaRow(
      media_id: Long, uri: String, mime: String, data: Array[Byte])

  final case class MediaFeatures(
      media_id: Long, uri: String, mime: String,
      width: Int, height: Int, n_frames: Int,
      size_bytes: Long, checksum: Long, valid: Boolean)

  val mediaSchema: StructType = Encoders.product[MediaRow].schema
  val featureSchema: StructType = Encoders.product[MediaFeatures].schema

  /** Deterministic synthetic media: 16-byte header `[w:4][h:4][frames:4][pad:4]`
    * little-endian, then `w*h` payload bytes. Stands in for a real container
    * format so decode plumbing is exercisable offline. */
  object SyntheticMedia {
    def encode(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
      val payload = new Array[Byte](width * height)
      var s = seed
      var i = 0
      while (i < payload.length) {
        s = s * 6364136223846793005L + 1442695040888963407L // LCG, deterministic
        payload(i) = (s >>> 56).toByte
        i += 1
      }
      java.nio.ByteBuffer.allocate(16 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(width).putInt(height).putInt(frames).putInt(0)
        .put(payload).array()
    }
  }

  /** The per-partition codec. Image formats the JRE ships decoders for
    * (PNG, BMP, GIF) are decoded for real via `javax.imageio`; anything
    * else falls back to the synthetic-header stub. Dispatch is by magic
    * number, not mime, so mislabeled bytes are still decoded correctly. */
  object MediaCodec {

    // ImageIO's default stream cache spools through a TEMP FILE per read —
    // pure overhead when the source is already an in-memory byte array.
    // JVM-global flag, set once when the codec first loads.
    javax.imageio.ImageIO.setUseCache(false)

    private def isPng(d: Array[Byte]): Boolean =
      d.length >= 8 && d(0) == 0x89.toByte && d(1) == 'P' && d(2) == 'N' && d(3) == 'G'
    private def isBmp(d: Array[Byte]): Boolean =
      d.length >= 2 && d(0) == 'B' && d(1) == 'M'
    private def isGif(d: Array[Byte]): Boolean =
      d.length >= 4 && d(0) == 'G' && d(1) == 'I' && d(2) == 'F' && d(3) == '8'
    // JPEG/JFIF/EXIF all start FF D8 FF; the JRE ships a native decoder —
    // the first real-world format a web-crawl image corpus hits
    private def isJpeg(d: Array[Byte]): Boolean =
      d.length >= 3 && d(0) == 0xFF.toByte && d(1) == 0xD8.toByte &&
        d(2) == 0xFF.toByte
    private def isWav(d: Array[Byte]): Boolean =
      d.length >= 12 && d(0) == 'R' && d(1) == 'I' && d(2) == 'F' && d(3) == 'F' &&
        d(8) == 'W' && d(9) == 'A' && d(10) == 'V' && d(11) == 'E'

    /** Real WAV encode via `javax.sound.sampled` (16-bit PCM mono,
      * little-endian, deterministic LCG samples) — real audio bytes with
      * known content, the audio analog of [[encodePng]]. */
    def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
      val pcm = new Array[Byte](nSamples * 2)
      var s = seed
      var i = 0
      while (i < nSamples) {
        s = s * 6364136223846793005L + 1442695040888963407L
        val v = (s >>> 48).toShort
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Real WAV decode: format + raw PCM bytes; None for corrupt input. */
    def decodeAudio(data: Array[Byte])
        : Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(data))
        val pcm = try in.readAllBytes() finally in.close()
        Some((in.getFormat, pcm))
      } catch { case _: Exception => None }

    /** RMS amplitude of 16-bit little-endian PCM, normalized to [0, 1] —
      * the canonical cheap audio feature (silence/clipping screens). */
    def pcmRms(pcm: Array[Byte]): Double = {
      val n = pcm.length / 2
      if (n == 0) return 0.0
      var acc = 0.0
      var i = 0
      while (i < n) {
        val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc / n) / 32768.0
    }

    /** Real image decode. ImageIO readers are not thread-safe to share, but
      * each call constructs its own via the static entry point; the JRE
      * caches the SPI lookup, so per-partition amortization still applies. */
    def decodeImage(data: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data)))
      catch { case _: Exception => None }

    /** Order-dependent checksum over decoded ARGB pixels — the real-image
      * analog of the stub's payload checksum: identical pixels ⇒ identical
      * checksum, independent of how the bytes were compressed. */
    def pixelChecksum(img: java.awt.image.BufferedImage): Long = {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum = sum * 31 + img.getRGB(x, y); x += 1 }
        y += 1
      }
      sum
    }

    /** Deterministic PNG encode (LCG gray pixels) — lets tests and the
      * synthetic table produce REAL image bytes with known geometry. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var s = seed
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          s = s * 6364136223846793005L + 1442695040888963407L
          val g = (s >>> 56).toInt & 0xff
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Deterministic JPEG encode (same LCG gray pixels as [[encodePng]])
      * via the JRE's native JPEG writer — real lossy-compressed bytes for
      * the round-trip spec. Geometry survives exactly; pixels only
      * approximately (JPEG is lossy), which is why [[decode]] reports
      * geometry + checksum rather than asserting byte identity. */
    def encodeJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var s = seed
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          s = s * 6364136223846793005L + 1442695040888963407L
          val g = (s >>> 56).toInt & 0xff
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }

    /** Real resize: decode → scale to fit `maxDim` (aspect preserved) →
      * re-encode PNG. None for undecodable bytes. */
    def thumbnailPng(data: Array[Byte], maxDim: Int): Option[Array[Byte]] =
      decodeImage(data).map { img =>
        val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
        val tw = math.max(1, math.round(img.getWidth * scale).toInt)
        val th = math.max(1, math.round(img.getHeight * scale).toInt)
        val thumb = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = thumb.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(thumb, "png", out)
        out.toByteArray
      }

    /** Decode geometry + checksum; None for corrupt/truncated input.
      * Real formats first (by magic), synthetic header otherwise. For
      * AUDIO the geometry tuple is overloaded: (sample rate, channels,
      * PCM frames, checksum over PCM bytes) — one feature schema for
      * every modality; [[audioFeatures]] is the properly-named face. */
    def decode(data: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (data == null || data.length < 16) return None
      if (isPng(data) || isBmp(data) || isGif(data) || isJpeg(data))
        return decodeImage(data).map(img =>
          (img.getWidth, img.getHeight, 1, pixelChecksum(img)))
      if (isWav(data))
        return decodeAudio(data).map { case (fmt, pcm) =>
          var sum = 0L
          var i = 0
          while (i < pcm.length) { sum = sum * 31 + (pcm(i) & 0xff); i += 1 }
          (fmt.getSampleRate.toInt, fmt.getChannels,
            pcm.length / math.max(1, fmt.getFrameSize), sum)
        }
      val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(0); val h = bb.getInt(4); val f = bb.getInt(8)
      // length check in Long math: huge header dims would overflow Int
      // (w*h wraps to <=0) and slip a truncated buffer past the guard
      if (w <= 0 || h <= 0 || f <= 0 || data.length < 16L + w.toLong * h) return None
      var sum = 0L
      var i = 16
      while (i < 16 + w * h) { sum = sum * 31 + (data(i) & 0xff); i += 1 }
      Some((w, h, f, sum))
    }
  }

  /** Batched per-partition metadata/feature extraction (decode stub). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition setup happens HERE once (real codec init goes here)
      rows.map { r =>
        MediaCodec.decode(r.data) match {
          case Some((w, h, f, sum)) =>
            MediaFeatures(r.media_id, r.uri, r.mime, w, h, f,
              if (r.data == null) 0L else r.data.length.toLong, sum, valid = true)
          case None =>
            MediaFeatures(r.media_id, r.uri, r.mime, -1, -1, -1,
              if (r.data == null) 0L else r.data.length.toLong, 0L, valid = false)
        }
      }
    }
  }

  /** Real image resize over the media column: decode → fit to `maxDim` →
    * re-encode PNG, batched per partition. Non-image/corrupt rows pass
    * through with a null thumbnail (kept, so callers can audit coverage). */
  def thumbnails(media: Dataset[MediaRow], maxDim: Int): DataFrame = {
    implicit val enc =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY)
    media.mapPartitions { rows =>
      rows.map(r => (r.media_id, r.uri,
        MediaCodec.thumbnailPng(r.data, maxDim).orNull))
    }.toDF("media_id", "uri", "thumb_png")
  }

  /** Real audio feature extraction over the media column: decode WAV via
    * `javax.sound.sampled`, emit (sample rate, channels, PCM frames, RMS
    * amplitude) per item, batched per partition like every codec path.
    * Non-audio/corrupt rows are kept with nulls so coverage is auditable. */
  def audioFeatures(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[(Long, String,
      Option[Int], Option[Int], Option[Long], Option[Double])]
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.decodeAudio(if (r.data == null) Array.emptyByteArray else r.data) match {
          case Some((fmt, pcm)) =>
            (r.media_id, r.uri, Some(fmt.getSampleRate.toInt),
              Some(fmt.getChannels),
              Some(pcm.length.toLong / math.max(1, fmt.getFrameSize)),
              Some(MediaCodec.pcmRms(pcm)))
          case None => (r.media_id, r.uri, None, None, None, None)
        }
      }
    }.toDF("media_id", "uri", "sample_rate", "channels", "n_samples", "rms")
  }

  /** Frame sampling (video analog): emits one row per sampled frame index —
    * `explode` of a per-item frame list computed inside the batched task. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    val feats = extractFeatures(media)
    feats.filter(col("valid"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
      .select(col("media_id"), col("uri"), col("frame_idx"))
  }

  /** Synthesize a deterministic media table (used by tests and the x5
    * query). Image rows carry REAL PNG bytes (encoded with the JRE codec,
    * decoded back by the real ImageIO arm of [[MediaCodec]]); audio rows
    * carry REAL WAV bytes (16-bit PCM via javax.sound, decoded by the
    * real audio arm); only video still uses the synthetic container. */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val w = 8 + (i % 5).toInt * 4
      val h = 8 + (i % 3).toInt * 4
      val frames = 1 + (i % 7).toInt
      val mime = if (i % 3 == 0) "image/png" else if (i % 3 == 1) "video/fake" else "audio/wav"
      val data =
        if (i % 97 == 13) Array[Byte](1, 2, 3) // planted corrupt items
        else if (i % 3 == 0) MediaCodec.encodePng(w, h, seed = i)
        else if (i % 3 == 2) MediaCodec.encodeWav(
          nSamples = 32 + (i % 50).toInt, sampleRate = 8000, seed = i)
        else SyntheticMedia.encode(w, h, frames, seed = i)
      MediaRow(i, s"synthetic://media/$i", mime, data)
    }
  }
}

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
  * STUB NOTICE: the container has no image/audio codecs, so the byte-level
  * decoders below are deterministic fakes over a synthetic header layout
  * (documented at [[SyntheticMedia]]). The Spark-side contract — schema,
  * encoders, batch shape, partition amortization, null/corrupt handling —
  * is real and tested; swap [[MediaCodec]] for a real codec binding to go
  * to production.
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

  /** The per-partition "codec". A production build replaces this object with
    * real decoders; everything else in the module is unchanged. */
  object MediaCodec {
    /** Decode header + checksum payload; None for corrupt/truncated input. */
    def decode(data: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (data == null || data.length < 16) return None
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

  /** Frame sampling (video analog): emits one row per sampled frame index —
    * `explode` of a per-item frame list computed inside the batched task. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    val feats = extractFeatures(media)
    feats.filter(col("valid"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
      .select(col("media_id"), col("uri"), col("frame_idx"))
  }

  /** Synthesize a deterministic media table (driver of the stub pipeline —
    * also used by tests and the x5 query). */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val w = 8 + (i % 5).toInt * 4
      val h = 8 + (i % 3).toInt * 4
      val frames = 1 + (i % 7).toInt
      val mime = if (i % 3 == 0) "image/fake" else if (i % 3 == 1) "video/fake" else "audio/fake"
      val data =
        if (i % 97 == 13) Array[Byte](1, 2, 3) // planted corrupt items
        else SyntheticMedia.encode(w, h, frames, seed = i)
      MediaRow(i, s"synthetic://media/$i", mime, data)
    }
  }
}

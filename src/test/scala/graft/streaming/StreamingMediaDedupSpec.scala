package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ext.{ImageDedup, IncrementalDedup, Multimodal}

/** [[StreamingMediaDedup]]: continuous perceptual media dedup against a
  * persisted signature index. Pins (1) equivalence with the X88 batch
  * fold ([[IncrementalDedup.foldBatchesHamming]]) on real image
  * fingerprints with cross-batch JPEG re-encodes, (2) replay idempotence
  * (the at-least-once contract of foreachBatch), (3) the real streaming
  * wrapper end-to-end over a MemoryStream. */
class StreamingMediaDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_smd").toString

  private def imgFp(rows: Seq[Multimodal.MediaRow]): DataFrame =
    ImageDedup.fingerprints(spark.createDataset(rows))
      .select($"media_id", $"dhash".as("sig"), $"checksum".as("verify"))

  // batch 0: originals (seeds 0..3); batch 1: JPEG re-encodes of seeds
  // 0..1 + a new original (seed 4); batch 2: re-encode of seed 4 + new 5
  private def b0 = imgFp((0L until 4L).map(s =>
    Multimodal.MediaRow(s, s"o/$s", "image/png",
      ImageDedup.encodeSmoothPng(64, 48, s))))
  private def b1 = imgFp(Seq(
    Multimodal.MediaRow(100, "j/0", "image/jpeg", ImageDedup.encodeSmoothJpeg(64, 48, 0)),
    Multimodal.MediaRow(101, "j/1", "image/jpeg", ImageDedup.encodeSmoothJpeg(64, 48, 1)),
    Multimodal.MediaRow(104, "o/4", "image/png", ImageDedup.encodeSmoothPng(64, 48, 4))))
  private def b2 = imgFp(Seq(
    Multimodal.MediaRow(200, "j/4", "image/jpeg", ImageDedup.encodeSmoothJpeg(64, 48, 4)),
    Multimodal.MediaRow(205, "o/5", "image/png", ImageDedup.encodeSmoothPng(64, 48, 5))))

  private val survivors = Set(0L, 1L, 2L, 3L, 104L, 205L)

  private def outIds(outDir: String): Set[Long] =
    spark.read.parquet(outDir).select("media_id").as[Long].collect().toSet

  test("batch-by-batch processing equals the X88 batch fold") {
    val (idx, out) = (tmp(), tmp())
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamingMediaDedup.processBatch(b, i.toLong, maxHamming = 10, idx, out)
    }
    val folded = IncrementalDedup.foldBatchesHamming(
        spark, Seq(b0, b1, b2), maxHamming = 10)
      .select("media_id").as[Long].collect().toSet
    assert(outIds(out) === folded)
    assert(outIds(out) === survivors)
  }

  test("replaying a batch is bit-identical (at-least-once safety)") {
    val (idx, out) = (tmp(), tmp())
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamingMediaDedup.processBatch(b, i.toLong, maxHamming = 10, idx, out)
    }
    // crash-after-commit replay of batch 1: its own sigs are already in
    // the index, which must be excluded or the whole batch matches away
    StreamingMediaDedup.processBatch(b1, 1L, maxHamming = 10, idx, out)
    assert(outIds(out) === survivors,
      "replay must not drop or duplicate batch-1 survivors")
    // 4 + 3 + 2 decodable items, one index row each, overwritten not appended
    assert(spark.read.parquet(idx).count() === 9)
  }

  test("the streaming wrapper dedups a MemoryStream of fingerprints end-to-end") {
    val (idx, out, ckpt) = (tmp(), tmp(), tmp())
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = StreamingMediaDedup.start(
      mem.toDF().toDF("media_id", "sig", "verify"), maxHamming = 2,
      idx, out, ckpt)
    def rows(df: DataFrame): Seq[(Long, Long, Long)] =
      df.as[(Long, Long, Long)].collect().toSeq
    try {
      mem.addData(rows(b0): _*); q.processAllAvailable()
      mem.addData(rows(b1): _*); q.processAllAvailable()
      mem.addData(rows(b2): _*); q.processAllAvailable()
    } finally q.stop()
    // radius 2: JPEG re-encodes of these smooth images stay within 2
    // bits of their originals (ImageDedupSpec margin), so the survivor
    // set is the same as the radius-10 batch tests
    assert(outIds(out) === survivors)
  }
}

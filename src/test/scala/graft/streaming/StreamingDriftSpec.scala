package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Drift

/** [[StreamingDrift]]: windowed PSI maintenance. Pins (1) the streamed
  * report ≡ the batch [[Drift.psi]] over the same rows bit for bit
  * (same bin expression, smoothing, normalization, rounding), (2) a
  * planted later-window shift scores strictly higher than the
  * in-distribution window, (3) replay idempotence through processBatch,
  * (4) the MemoryStream wrapper end to end. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2026-03-01 10:$m%02d:00")

  // window 1 (10:00) in-distribution; window 2 (11:00) shifted up
  private val ref = (1 to 400).map(i => (i % 100) / 100.0)
  private val w1 = (1 to 200).map(i => (ts(i % 50), (i % 100) / 100.0))
  private val w2 = (1 to 200).map(i =>
    (Timestamp.valueOf("2026-03-01 11:05:00"), 0.5 + (i % 50) / 100.0))

  test("streamed report == batch Drift.psi; shifted window scores higher") {
    val root = Files.createTempDirectory("graft_sdrift").toString
    val b0 = w1.take(100) ++ w2.take(80)
    val b1 = w1.drop(100) ++ w2.drop(80)
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      StreamingDrift.processBatch(b.toDF("ts", "v"), i.toLong, "ts", "v",
        "1 hour", bins = 10, lo = 0.0, hi = 1.0,
        s"$root/p", s"$root/state")
    }
    val refHist = StreamingDrift.referenceHistogram(
      ref.toDF("v"), "v", bins = 10, lo = 0.0, hi = 1.0)
    val got = StreamingDrift.report(spark, s"$root/state", refHist)
      .orderBy($"win").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSeq

    // batch oracle: Drift.psi with the reference replicated per window
    val after = (b0 ++ b1).toDF("ts", "v")
      .select(window($"ts", "1 hour").getField("start").as("win"), $"v")
    val wins = after.select($"win").distinct()
    val before = wins.crossJoin(ref.toDF("v"))
    val want = Drift.psi(before, after, Seq("win"), "v",
        bins = 10, lo = 0.0, hi = 1.0)
      .orderBy($"win").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSeq
    assert(got === want)
    // the shifted window drifts, the in-distribution one does not
    assert(got.size === 2 && got(1)._2 > got(0)._2 && got(0)._2 < 0.05)

    // replay (at-least-once): histogram state and report unchanged
    StreamingDrift.processBatch(b1.toDF("ts", "v"), 1L, "ts", "v",
      "1 hour", bins = 10, lo = 0.0, hi = 1.0, s"$root/p", s"$root/state")
    val replayed = StreamingDrift.report(spark, s"$root/state", refHist)
      .orderBy($"win").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSeq
    assert(replayed === got)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("MemoryStream end-to-end") {
    val root = Files.createTempDirectory("graft_sdrift2").toString
    val mem = MemoryStream[(Timestamp, Double)](spark)
    val q = StreamingDrift.start(mem.toDF().toDF("ts", "v"), "ts", "v",
      "1 hour", bins = 10, lo = 0.0, hi = 1.0,
      s"$root/p", s"$root/state", s"$root/ckpt")
    try {
      mem.addData(w1: _*); q.processAllAvailable()
      mem.addData(w2: _*); q.processAllAvailable()
    } finally q.stop()
    val refHist = StreamingDrift.referenceHistogram(
      ref.toDF("v"), "v", bins = 10, lo = 0.0, hi = 1.0)
    val rows = StreamingDrift.report(spark, s"$root/state", refHist)
      .orderBy($"win").collect()
    assert(rows.length === 2 && rows(1).getDouble(1) > rows(0).getDouble(1))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}

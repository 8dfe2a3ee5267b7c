package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val imps = Seq(
    (1L, ts("2024-06-01 09:00:00"), 100L),
    (1L, ts("2024-06-01 12:00:00"), 101L), // never clicked
    (2L, ts("2024-06-01 09:30:00"), 102L)
  ).toDF("ad_id", "imp_ts", "imp_id")

  private lazy val clicks = Seq(
    (1L, ts("2024-06-01 09:40:00"), 200L), // within 1h of imp 100
    (1L, ts("2024-06-01 08:50:00"), 201L), // BEFORE the impression: no match
    (2L, ts("2024-06-01 10:31:00"), 202L), // 61 min after imp 102: outside
    (3L, ts("2024-06-01 09:00:00"), 203L)  // key with no impression
  ).toDF("ad_id", "click_ts", "click_id")

  test("batch: interval bound is [leftTime, leftTime + horizon]") {
    val got = StreamJoin.within(imps, clicks, "ad_id", "imp_ts", "click_ts")
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 200L)))
  }

  test("batch: boundary click at exactly +horizon matches (closed interval)") {
    val c = Seq((2L, ts("2024-06-01 10:30:00"), 210L))
      .toDF("ad_id", "click_ts", "click_id")
    val got = StreamJoin.within(imps, c, "ad_id", "imp_ts", "click_ts")
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === Set((102L, 210L)))
  }

  test("streaming inner join equals batch on bounded input") {
    val dir = Files.createTempDirectory("graft_sjoin").toString
    imps.write.parquet(s"$dir/imps")
    clicks.write.parquet(s"$dir/clicks")
    val si = spark.readStream.schema(imps.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/imps")
    val sc = spark.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/clicks")
    val q = StreamJoin.within(si, sc, "ad_id", "imp_ts", "click_ts")
      .select("imp_id", "click_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("sjoin_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sjoin_out").as[(Long, Long)].collect().toSet
    val batch = StreamJoin.within(imps, clicks, "ad_id", "imp_ts", "click_ts")
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streaming left_outer emits unmatched rows once the watermark passes") {
    val dir = Files.createTempDirectory("graft_sjoin_lo").toString
    // STAGED arrival, not one load: watermark-advancing sentinels must
    // reach the source only AFTER the real rows are in join state —
    // inside a single backlog, maxFilesPerTrigger drains files in
    // arbitrary order, and a sentinel processed first advances the
    // watermark past the real rows, which are then dropped as late data
    // (the operator working as specified, the test racing itself).
    // The delay must also EXCEED the real data's time span: the real
    // rows alone advance the watermark as their files drain, and with a
    // short delay the drain order could still lateness-drop the earliest
    // row — hence "1 day" against a 4-hour fixture.
    imps.write.parquet(s"$dir/imps")
    clicks.write.parquet(s"$dir/clicks")
    val si = spark.readStream.schema(imps.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/imps")
    val sc = spark.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/clicks")
    val q = StreamJoin.within(si, sc, "ad_id", "imp_ts", "click_ts",
        watermark = "1 day", joinType = "left_outer")
      .select($"imp_id", $"click_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("sjoin_lo_out").start()
    q.processAllAvailable() // all real rows in state, watermark still at epoch
    // sentinels push BOTH watermarks past every real row's horizon
    Seq((9L, ts("2024-06-03 00:00:00"), 999L))
      .toDF("ad_id", "imp_ts", "imp_id")
      .write.mode("append").parquet(s"$dir/imps")
    Seq((9L, ts("2024-06-03 00:00:00"), 998L))
      .toDF("ad_id", "click_ts", "click_id")
      .write.mode("append").parquet(s"$dir/clicks")
    q.processAllAvailable()
    // outer-join rows closed by the FINAL watermark advance are flushed
    // in the NEXT micro-batch — nudge one more batch through each side
    Seq((8L, ts("2024-06-04 00:00:00"), 997L))
      .toDF("ad_id", "imp_ts", "imp_id")
      .write.mode("append").parquet(s"$dir/imps")
    Seq((8L, ts("2024-06-04 00:00:00"), 996L))
      .toDF("ad_id", "click_ts", "click_id")
      .write.mode("append").parquet(s"$dir/clicks")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sjoin_lo_out")
      .as[(Long, Option[Long])].collect().toSet
    // matched pair, unmatched imps with null clicks (101 never clicked,
    // 102's click is outside the horizon)
    assert(got.contains((100L, Some(200L))))
    assert(got.contains((101L, None)))
    assert(got.contains((102L, None)))
  }
}

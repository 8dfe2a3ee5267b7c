package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions (09:00-09:20 with 3 events, 11:00 with 1);
  // user 2: one session spanning the 30-min gap boundary exactly
  private lazy val events = Seq(
    (1L, ts("2024-06-01 09:00:00"), 1.0),
    (1L, ts("2024-06-01 09:10:00"), 2.0),
    (1L, ts("2024-06-01 09:20:00"), 3.0),
    (1L, ts("2024-06-01 11:00:00"), 4.0),
    (2L, ts("2024-06-01 09:00:00"), 5.0),
    (2L, ts("2024-06-01 09:29:00"), 6.0)
  ).toDF("user_id", "ts", "value")

  test("batch sessionization merges gap-adjacent events") {
    val got = Sessionize.sessions(events, "user_id", "ts", "value")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, ts("2024-06-01 09:00:00"), ts("2024-06-01 09:50:00"), 3L, 6.0),
      (1L, ts("2024-06-01 11:00:00"), ts("2024-06-01 11:30:00"), 1L, 4.0),
      (2L, ts("2024-06-01 09:00:00"), ts("2024-06-01 09:59:00"), 2L, 11.0)))
  }

  test("streaming sessionization equals batch on bounded input") {
    val dir = Files.createTempDirectory("graft_sessions").toString
    // sentinel far in the future advances the watermark past all sessions;
    // ONE part file so the sentinel cannot drain before the real rows and
    // lateness-drop them (see StreamingSpec's determinism note)
    val withSentinel = events.unionByName(
      Seq((99L, ts("2024-06-02 12:00:00"), 0.0)).toDF("user_id", "ts", "value"))
    withSentinel.coalesce(1).write.parquet(s"$dir/data")
    val stream = spark.readStream
      .schema(withSentinel.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/data")
    val q = Sessionize.sessions(stream, "user_id", "ts", "value")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_out")
      .filter($"user_id" =!= 99L)
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = Sessionize.sessions(events, "user_id", "ts", "value")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed === batch)
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    val dir = Files.createTempDirectory("graft_running").toString
    Seq((1L, ts("2024-06-01 09:00:00"), 1.0), (2L, ts("2024-06-01 09:00:00"), 10.0))
      .toDF("key", "ts", "value").coalesce(1).write.parquet(s"$dir/f1")
    Seq((1L, ts("2024-06-01 09:05:00"), 2.0))
      .toDF("key", "ts", "value").coalesce(1).write.parquet(s"$dir/f2")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/f*")
      .as[Sessionize.KeyedEvent]
    val q = Sessionize.runningTotalsToMemory(stream, "running_out")
    q.stop()
    // update mode: key 1 emitted per batch; LAST emission carries the
    // cross-batch cumulative state
    val byKey = spark.table("running_out")
      .groupBy("key").agg(max(struct($"n", $"sum")).as("last"))
      .select($"key", $"last.n", $"last.sum")
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(byKey(1L) === ((2L, 3.0)))
    assert(byKey(2L) === ((1L, 10.0)))
  }

  test("idle keys are evicted by event time; a later event restarts from zero") {
    val dir = Files.createTempDirectory("graft_evict").toString
    // batch 1: key 1 at 09:00 (timeout registered at 10:00 with 1 h idle)
    Seq((1L, ts("2024-06-01 09:00:00"), 1.0))
      .toDF("key", "ts", "value").coalesce(1).write.parquet(s"$dir/f1")
    // batch 2: advancer key 2 at 13:00 → watermark 12:50 (10 min delay)
    Seq((2L, ts("2024-06-01 13:00:00"), 10.0))
      .toDF("key", "ts", "value").coalesce(1).write.parquet(s"$dir/f2")
    // batch 3: key 1's timed-out state is swept (watermark 12:50 > 10:00)
    Seq((3L, ts("2024-06-01 13:30:00"), 0.0))
      .toDF("key", "ts", "value").coalesce(1).write.parquet(s"$dir/f3")
    // batch 4: key 1 returns — state was evicted, so it restarts at n=1
    Seq((1L, ts("2024-06-01 13:31:00"), 5.0))
      .toDF("key", "ts", "value").coalesce(1).write.parquet(s"$dir/f4")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/f*")
      .as[Sessionize.KeyedEvent]
    val q = Sessionize.runningTotalsToMemory(stream, "evict_out")
    q.stop()
    val key1 = spark.table("evict_out").filter($"key" === 1L)
      .select($"n", $"sum").as[(Long, Double)].collect().toSeq
    // restart emission present; no cross-eviction accumulation (n=2) ever
    assert(key1.contains((1L, 5.0)), key1.toString)
    assert(!key1.exists(_._1 == 2L), key1.toString)
  }
}

package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.HourlyAggregate

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly aggregation equals batch on bounded input") {
    val dir = Files.createTempDirectory("graft_stream").toString
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = for (b <- Seq(1L, 2L); q <- 0 until 12)
      yield (new Timestamp(ts("2024-05-01 00:00:00").getTime + q * 15 * 60 * 1000L),
        b, (b * 10 + q % 4).toDouble)
    // sentinel far in the future: advances the watermark past every real
    // window so append mode emits them all on bounded input. ONE part
    // file on purpose: co-loaded with real rows across several files,
    // the sentinel could drain first and lateness-drop everything after
    // it (watermark moves at batch end; a single file = a single batch).
    val all = rows :+ ((ts("2024-05-02 12:00:00"), 99L, 0.0))
    val df = all.toDF("timestamp", "bldg_id", "m")
    df.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = StreamingHourly.query(
      spark, dir, df.schema, measureCols = Seq("m"), watermark = "2 hours")
    val q = StreamingHourly.runBounded(stream, "stream_out")
    q.stop()

    val streamed = spark.table("stream_out")
      .filter($"bldg_id_min" =!= 99L)
      .select("timestamp", "bldg_id_min", "timestamp_min", "m_mean")
      .orderBy("bldg_id_min", "timestamp")
      .collect()
    val batch = HourlyAggregate(df.filter($"bldg_id" =!= 99L), measureCols = Seq("m"))
      .orderBy("bldg_id_min", "timestamp")
      .collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
  }
}

class HoppingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hopping windows equal the batch face (q65's operator)") {
    val dir = Files.createTempDirectory("graft_hop").toString
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = (0 until 48).map(i =>
      (new Timestamp(ts("2024-05-01 00:00:00").getTime + i * 17 * 60 * 1000L),
        (i % 5).toDouble))
    val df = rows.toDF("ts", "v")
    df.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      // delay wider than the fixture's ~14 h span, and the sentinel is
      // STAGED after the real backlog drains: files drain in arbitrary
      // order inside one backlog, so a co-loaded sentinel can advance the
      // watermark mid-drain and lateness-drop everything after it (same
      // determinism rules as StreamJoinSpec)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("window.start").as("w"), col("n"), col("sv"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("hop_out").start()
    q.processAllAvailable() // real rows in state, watermark below them all
    Seq((ts("2024-05-03 00:00:00"), 0.0)).toDF("ts", "v")
      .write.mode("append").parquet(dir) // sentinel closes every window
    q.processAllAvailable()
    q.stop()

    val sentinelWindows = Set(ts("2024-05-02 23:00:00"), ts("2024-05-03 00:00:00"))
    val streamed = spark.table("hop_out")
      .filter(!col("w").isin(sentinelWindows.toSeq: _*))
      .orderBy("w").as[(Timestamp, Long, Double)].collect().toSeq
    val batch = df
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("window.start").as("w"), col("n"), col("sv"))
      .orderBy("w").as[(Timestamp, Long, Double)].collect().toSeq
    assert(streamed === batch)
    // every non-edge event lands in exactly size/slide = 2 windows
    assert(batch.map(_._2).sum === 2L * 48)
  }
}

class StreamingParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed parquet sink: restart resumes, no duplicate windows") {
    val root = Files.createTempDirectory("graft_psink").toString
    def ts(s: String) = Timestamp.valueOf(s)
    def rows(b: Long, h: Int, v: Double) =
      Seq((new Timestamp(ts("2024-05-01 00:00:00").getTime + h * 3600 * 1000L), b, v))
    // run 1: hours 0-1 for building 1 + sentinel at hour 4 → watermark
    // hour 2 (2 h delay) closes hours 0-1 but keeps later hours live
    (rows(1L, 0, 1.0) ++ rows(1L, 1, 2.0) ++ rows(99L, 4, 0.0))
      .toDF("timestamp", "bldg_id", "m")
      .write.mode("append").parquet(s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema
    def stream() = StreamingHourly.query(
      spark, s"$root/in", schema, measureCols = Seq("m"), watermark = "2 hours")
    StreamingHourly.runToParquet(stream(), s"$root/out", s"$root/ckpt")
    val afterFirst = spark.read.parquet(s"$root/out")
      .filter($"bldg_id_min" =!= 99L).count()
    assert(afterFirst === 2) // both closed hours emitted

    // run 2 (restart from checkpoint): hour 3 (inside the watermark) + a
    // sentinel at hour 8 that closes it
    (rows(1L, 3, 3.0) ++ rows(98L, 8, 0.0))
      .toDF("timestamp", "bldg_id", "m")
      .write.mode("append").parquet(s"$root/in")
    StreamingHourly.runToParquet(stream(), s"$root/out", s"$root/ckpt")
    val out = spark.read.parquet(s"$root/out")
      .filter($"bldg_id_min" =!= 99L && $"bldg_id_min" =!= 98L)
      .select($"timestamp", $"m_mean").orderBy($"timestamp")
      .as[(Timestamp, Double)].collect()
    // exactly one row per closed hour — the restart neither re-emitted old
    // windows nor dropped the new one
    assert(out.map(_._2).toSeq === Seq(1.0, 2.0, 3.0))
    assert(out.map(_._1).distinct.length === 3)
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("stateful dedup drops cross-batch duplicates within the watermark") {
    val dir = Files.createTempDirectory("graft_sdedup").toString
    def ts(s: String) = Timestamp.valueOf(s)
    // two files → two micro-batches with maxFilesPerTrigger=1
    Seq((1L, "alpha beta", ts("2024-05-01 10:00:00")),
      (2L, "gamma delta", ts("2024-05-01 10:01:00")))
      .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$dir/f1")
    Seq((3L, "ALPHA  beta", ts("2024-05-01 10:02:00")), // dup after normalization
      (4L, "epsilon zeta", ts("2024-05-01 10:03:00")))
      .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$dir/f2")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/f*")
    val deduped = StreamingDedup.exactByContent(stream, "text", "ts")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sdedup_out").select("doc_id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L, 4L)) // doc 3 dropped as duplicate of 1
  }

  test("dedup state is evicted by the watermark (bounded-state contract)") {
    val dir = Files.createTempDirectory("graft_sdedup_evict").toString
    def ts(s: String) = Timestamp.valueOf(s)
    // batch 1: first copy at 10:00
    Seq((1L, "alpha beta", ts("2024-05-01 10:00:00")))
      .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$dir/f1")
    // batch 2: unrelated event at 13:00 advances the watermark to 12:00
    // (1 h retention) — past the 11:00 expiry of doc 1's fingerprint state
    Seq((2L, "gamma delta", ts("2024-05-01 13:00:00")))
      .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$dir/f2")
    // batch 3: eviction runs during the batch AFTER the watermark advances —
    // this batch's end-of-batch cleanup removes doc 1's expired state row
    Seq((4L, "eta theta", ts("2024-05-01 14:00:00")))
      .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$dir/f3")
    // batch 4: a late duplicate of doc 1 — its state is gone, so it emits
    Seq((3L, "alpha beta", ts("2024-05-01 14:01:00")))
      .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$dir/f4")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/f*")
    val deduped = StreamingDedup.exactByContent(stream, "text", "ts", "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_evict_out").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sdedup_evict_out").select("doc_id").as[Long].collect().sorted
    // doc 3 re-emits: its duplicate arrived beyond the retention horizon,
    // proving the state row was dropped (not retained forever)
    assert(ids === Array(1L, 2L, 3L, 4L))
  }
}

class QueryRegistrySpec extends SparkSpec {
  import graft.queries.QueryRegistry
  import spark.implicits._

  test("saved queries render and run; names snake-case like the CDK") {
    assert(QueryRegistry.savedQueries.map(_.snakeName) === Seq(
      "total_number_of_individual_building_models",
      "number_of_buildings_by_building_type_group",
      "isolated_individual_building_models"))

    // metadata + hourly-data fixture honoring the _min rename contract
    Seq(
      (1L, "AK", "AK, Ketchikan Gateway Borough", "Hospital", "Healthcare"),
      (2L, "AK", "AK, Ketchikan Gateway Borough", "Hospital", "Healthcare"),
      (3L, "AK", "AK, Ketchikan Gateway Borough", "SmallOffice", "Office"),
      (4L, "AK", "AK, Other Borough", "Hospital", "Healthcare"))
      .toDF("bldg_id", "in.state", "in.county_name",
        "in.comstock_building_type", "in.comstock_building_type_group")
      .createOrReplaceTempView("meta_v")
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("bldg_id_min", "x_mean")
      .createOrReplaceTempView("data_v")
    val b = Map("metadata_table" -> "meta_v", "data_table" -> "data_v")

    assert(QueryRegistry.run(spark,
      "total_number_of_individual_building_models", b)
      .collect().head.getLong(0) === 2L)
    val byGroup = QueryRegistry.run(spark,
      "number_of_buildings_by_building_type_group", b)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup === Map("Healthcare" -> 2L, "Office" -> 1L))
    val isolated = QueryRegistry.run(spark,
      "isolated_individual_building_models", b)
      .collect().map(_.getLong(0)).sorted
    assert(isolated === Array(1L, 2L))
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static enrichment equals the batch left join; no state") {
    val root = Files.createTempDirectory("graft_enrich").toString
    val events = Seq(
      (1L, 10L, 5.0), (2L, 20L, 6.0), (3L, 10L, 7.0),
      (4L, 99L, 8.0)) // 99 has no dimension row — must survive as NULL
      .toDF("event_id", "dim_id", "value")
    events.repartition(2).write.parquet(s"$root/src")
    val dim = Seq((10L, "ten"), (20L, "twenty"), (30L, "unused"))
      .toDF("dim_id", "label")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
    val q = StreamEnrich.enrich(stream, dim, Seq("dim_id"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("enrich_out")
      .select("event_id", "dim_id", "value", "label")
      .orderBy("event_id").collect().toSeq
    val batch = StreamEnrich.enrich(events, dim, Seq("dim_id"))
      .select("event_id", "dim_id", "value", "label")
      .orderBy("event_id").collect().toSeq
    assert(streamed === batch)
    assert(streamed.map(_.getLong(0)) === Seq(1L, 2L, 3L, 4L))
    assert(streamed.last.isNullAt(3)) // unmatched event kept, label NULL
  }
}

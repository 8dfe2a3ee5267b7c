package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** [[StreamingSmooth]] — streaming EWMA ≡ the batch operator
  * (`ext/Smooth`) on the same in-order data; state carries across
  * micro-batches. */
class StreamingSmoothSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("streaming EWMA across micro-batches equals the batch recurrence") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingSmooth.Point]
    val q = StreamingSmooth.ewma(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("smooth_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two keys interleaved; batch 2 continues key 1
      mem.addData(
        StreamingSmooth.Point(1L, ts(1), 10.0),
        StreamingSmooth.Point(2L, ts(1), 100.0),
        StreamingSmooth.Point(1L, ts(2), 20.0))
      q.processAllAvailable()
      mem.addData(StreamingSmooth.Point(1L, ts(3), 10.0))
      q.processAllAvailable()

      val got = spark.table("smooth_out")
        .select("key", "ts", "ewma").as[(Long, Timestamp, Double)]
        .collect().toSet
      // key 1: 10 -> 15 -> 12.5 (state crossed the batch boundary)
      assert(got === Set(
        (1L, ts(1), 10.0), (1L, ts(2), 15.0), (1L, ts(3), 12.5),
        (2L, ts(1), 100.0)))

      // parity with the batch operator on the union of batches
      val batch = graft.ext.Smooth.ewma(
        Seq((1L, ts(1), 10.0), (2L, ts(1), 100.0), (1L, ts(2), 20.0),
          (1L, ts(3), 10.0)).toDF("key", "ts", "value"),
        "key", "ts", "value", alpha = 0.5)
        .select(col("key").as[Long], col("ts").as[Timestamp],
          col("ewma").as[Double]).collect().toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("within-batch rows fold in event-time order regardless of add order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingSmooth.Point]
    val q = StreamingSmooth.ewma(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("smooth_ord")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData( // deliberately out of time order
        StreamingSmooth.Point(7L, ts(3), 30.0),
        StreamingSmooth.Point(7L, ts(1), 10.0),
        StreamingSmooth.Point(7L, ts(2), 20.0))
      q.processAllAvailable()
      val got = spark.table("smooth_ord").orderBy("ts")
        .select("ewma").as[Double].collect().toSeq
      assert(got === Seq(10.0, 15.0, 22.5))
    } finally q.stop()
  }
}

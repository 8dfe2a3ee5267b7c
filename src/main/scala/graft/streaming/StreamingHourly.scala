package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming face of the ETL (SURVEY §2.7 / M1/M4).
  *
  * The reference's incremental file pacing (asyncio queues, poison pills,
  * idle watchdog) maps to a file-source stream: `maxFilesPerTrigger`
  * reproduces page-paced ingestion, watermark+window reproduces the hourly
  * aggregation on an unbounded feed, and an idle-timeout listener reproduces
  * the watchdog shutdown (`/root/reference/etl/oedi_etl/monitor.py:221-281`).
  * On bounded input the result equals the batch [[graft.etl.HourlyAggregate]]
  * (verified by StreamingSpec).
  */
object StreamingHourly {

  /** Streaming hourly aggregation over a file-source directory.
    * Complete/update semantics: uses watermark + append on the window close.
    * @param maxFilesPerTrigger reference listing page-size analog */
  def query(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      timeCol: String = "timestamp",
      idCol: String = "bldg_id",
      measureCols: Seq[String],
      watermark: String = "2 hours",
      maxFilesPerTrigger: Int = 500): DataFrame = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val aggs =
      min(col(idCol)).as(s"${idCol}_min") +:
        min(col(timeCol)).as(s"${timeCol}_min") +:
        measureCols.map(m => avg(col(s"`$m`")).as(s"${m}_mean"))
    stream
      .withWatermark(timeCol, watermark)
      .groupBy(col(idCol), window(col(timeCol), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        (col("window.start").as(timeCol) +:
          col(s"${idCol}_min") +:
          col(s"${timeCol}_min") +:
          measureCols.map(m => col(s"`${m}_mean`"))): _*)
  }

  /** Run the stream into an in-memory table until all currently-available
    * files are processed (bounded-input parity runs / tests). */
  def runBounded(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }

  /** Production sink: append closed hourly windows to snappy parquet with a
    * checkpoint — exactly-once file output across restarts (offsets + sink
    * commit log live in `checkpointDir`; a crashed batch is re-run, its
    * half-written files ignored by the commit protocol). The streaming
    * mirror of the batch JobRunner sink (S5). Drains what is available,
    * then terminates; re-invoke on a schedule (or swap the trigger for a
    * continuous service) — state carries over through the checkpoint. */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("compression", "snappy")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** M4 idle watchdog: stop the query after `idleTimeoutMs` with no progress
    * (no new input rows). The reference default is 5 minutes. */
  class IdleTimeoutListener(query: => StreamingQuery, idleTimeoutMs: Long)
      extends StreamingQueryListener {
    @volatile private var lastData = System.currentTimeMillis()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      if (e.progress.numInputRows > 0) lastData = System.currentTimeMillis()
      else if (System.currentTimeMillis() - lastData > idleTimeoutMs) query.stop()
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}

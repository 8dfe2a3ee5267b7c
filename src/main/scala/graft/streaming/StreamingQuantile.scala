package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of X64's incremental quantile maintenance
  * ([[graft.etl.IncrementalQuantile]]): continuously-maintained per-key
  * percentiles over an unbounded stream, with bounded state — every
  * micro-batch folds into the k-row-per-key bottom-k sample, so state
  * size never grows past k·|keys| no matter how much history the
  * percentiles summarize.
  *
  * Exactly-mergeable state makes the streaming face trivial: bottom-k of
  * a union is the bottom-k of unioned bottom-k's, so fold order and
  * micro-batch boundaries are IRRELEVANT to the final state (the
  * strongest replay story possible — any prefix of committed snapshots
  * is a correct state for the rows it has seen). Snapshots are versioned
  * per batchId and a fold reads its predecessor, so at-least-once
  * replays rewrite their own snapshot bit-identically (same pattern as
  * [[StreamingDecayed]]).
  */
object StreamingQuantile {

  /** One micro-batch: predecessor sample state + batch → `v=batchId`. */
  def processBatch(batch: DataFrame, batchId: Long, keys: Seq[String],
      valueCol: String, idCol: String, k: Int, seed: Long,
      stateDir: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val folded = stateVersionBefore(spark, stateDir, batchId) match {
      case Some(prev) => graft.etl.IncrementalQuantile.update(
        prev, batch, keys, valueCol, idCol, k, seed)
      case None => graft.etl.IncrementalQuantile.sample(
        batch, keys, valueCol, idCol, k, seed)
    }
    folded.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
  }

  /** Start the stream: every micro-batch through [[processBatch]]. */
  def start(stream: DataFrame, keys: Seq[String], valueCol: String,
      idCol: String, k: Int, stateDir: String, checkpointDir: String,
      seed: Long = 42L): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        processBatch(b.toDF(), id, keys, valueCol, idCol, k, seed, stateDir)
      }
      .start()

  /** Newest committed sample state; None before the first fold. Feed to
    * [[graft.etl.IncrementalQuantile.estimate]] for the percentiles. */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    stateVersionBefore(spark, stateDir, Long.MaxValue)

  /** Newest COMMITTED snapshot below `beforeId`: only `v=N` directories
    * carrying the committer's `_SUCCESS` marker count, so a crash that
    * left a partial snapshot never gets served (see [[StreamingDecayed]]
    * — same versioned-snapshot discipline). */
  private def stateVersionBefore(spark: SparkSession, stateDir: String,
      beforeId: Long): Option[DataFrame] =
    Option(new File(stateDir).list()).toSeq.flatten
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .filter(v => v < beforeId &&
        new File(stateDir, s"v=$v/_SUCCESS").exists())
      .sorted.lastOption
      .map(v => spark.read.parquet(s"$stateDir/v=$v"))
}

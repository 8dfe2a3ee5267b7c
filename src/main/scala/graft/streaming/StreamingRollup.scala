package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.MaterializedRollup

/** Streaming face of X91's materialized-rollup maintenance: a
  * continuously-ingesting fact stream keeps a queryable rollup fresh,
  * micro-batch by micro-batch, and [[graft.plans.RollupViewRewrite]]
  * keeps answering dashboard aggregations from it — the history is never
  * rescanned.
  *
  * Durability/replay contract — the [[StreamingMediaDedup]] recipe:
  * `foreachBatch` is AT-LEAST-ONCE, and a rollup merge is NOT idempotent
  * (re-applying a batch double-counts), so the batch's contribution is
  * stored as its PARTIALS under `batch_id=<id>` with dynamic partition
  * overwrite — a replay REPLACES its own partition bit-identically. The
  * queryable rollup is then re-merged from ALL partials (KB-sized per
  * batch: one row per key combination seen in that batch) and atomically
  * swapped, so replaying any batch reproduces the same rollup file. The
  * spec drives [[processBatch]] directly and replays a batch to pin it.
  *
  * Registration: pass `registerAs`+`basePath` to (re-)register the
  * rollup for rewriting after every batch — re-registration is required
  * because the cached relation pins the pre-swap file listing. */
object StreamingRollup {

  /** One micro-batch: write this batch's partials (idempotent), re-merge
    * the rollup, swap, optionally re-register. */
  def processBatch(batch: DataFrame, batchId: Long, keys: Seq[String],
      measures: Seq[String], partialsDir: String, mvPath: String,
      registerAs: Option[String] = None, basePath: String = ""): Unit = {
    val spark = batch.sparkSession
    // dynamic overwrite scoped to THIS writer (never the session conf:
    // a session-wide flip would change the semantics of concurrent
    // overwrite writes on the same session)
    MaterializedRollup.build(batch, keys, measures)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(partialsDir)
    val keyCols = keys.map(col)
    val aggs = MaterializedRollup.mergeAggs(measures)
    val merged = spark.read.parquet(partialsDir).drop("batch_id")
      .groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val fs = new org.apache.hadoop.fs.Path(mvPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = mvPath + "__stream_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    MaterializedRollup.swapDir(fs, tmp, mvPath)
    registerAs.foreach { name =>
      MaterializedRollup.register(spark, name, basePath, mvPath, keys, measures)
    }
  }

  /** Start the stream: every micro-batch of fact rows through
    * [[processBatch]]. */
  def start(stream: DataFrame, keys: Seq[String], measures: Seq[String],
      partialsDir: String, mvPath: String, checkpointDir: String,
      registerAs: Option[String] = None,
      basePath: String = ""): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        processBatch(b.toDF(), id, keys, measures, partialsDir, mvPath,
          registerAs, basePath)
      }
      .start()

}

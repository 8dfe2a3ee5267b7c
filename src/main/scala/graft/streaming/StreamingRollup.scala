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
    withDynamicOverwrite(spark) {
      MaterializedRollup.build(batch, keys, measures)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id").parquet(partialsDir)
    }
    val keyCols = keys.map(col)
    val aggs = sum(col("cnt")).as("cnt") +: measures.flatMap { c =>
      Seq(sum(col(s"sum_$c")).as(s"sum_$c"), min(col(s"min_$c")).as(s"min_$c"),
        max(col(s"max_$c")).as(s"max_$c"), sum(col(s"cnt_$c")).as(s"cnt_$c"))
    }
    val merged = spark.read.parquet(partialsDir).drop("batch_id")
      .groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val fs = new org.apache.hadoop.fs.Path(mvPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(mvPath + "__stream_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(new org.apache.hadoop.fs.Path(mvPath), true)
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(mvPath)),
      s"atomic swap failed for $mvPath")
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

  private def withDynamicOverwrite[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try f finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}

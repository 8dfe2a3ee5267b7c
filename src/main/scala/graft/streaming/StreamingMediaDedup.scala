package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of X88's incremental PERCEPTUAL media dedup
  * ([[graft.ext.IncrementalDedup.addBatchHamming]]): a continuously-
  * ingesting media corpus where every micro-batch of fingerprints
  * (media_id, 64-bit sig, verify checksum — X84/X85/X87 signatures all
  * plug in) is deduped against the signature index of everything that
  * arrived before it, then appended. History is never re-decoded or
  * rescanned; the index is 16 bytes per historical item.
  *
  * Durability/replay contract — shared verbatim with
  * [[StreamingDedupIndex]]: `foreachBatch` is AT-LEAST-ONCE, so both
  * sinks write `batch_id`-partitioned output with dynamic partition
  * overwrite (a replay REPLACES its own partition), and the index is
  * always read with the current batchId's partition EXCLUDED — on
  * replay the index already holds this batch's own signatures from the
  * first attempt, which would otherwise match the whole batch away and
  * overwrite its output with nothing. The spec drives [[processBatch]]
  * directly and replays a batch to pin bit-identity.
  *
  * Dedup semantics are exactly [[graft.ext.IncrementalDedup
  * .addBatchHamming]]'s prefix-causal contract: greedy min-id within
  * the batch, removal against anything earlier within `maxHamming`
  * (verify-gated when `requireVerifyMatch`), removed items' signatures
  * still indexed so chains collapse forward, NULL signatures surviving
  * but never indexed. */
object StreamingMediaDedup {

  /** One micro-batch of fingerprints through incremental perceptual
    * dedup: returns nothing, writes the surviving rows to `outDir` and
    * this batch's signatures to `indexDir`, both under `batch_id=<id>`. */
  def processBatch(batch: DataFrame, batchId: Long, maxHamming: Int,
      indexDir: String, outDir: String,
      requireVerifyMatch: Boolean = false,
      maxChunkFreq: Option[Int] = None): Unit = {
    val spark = batch.sparkSession
    val index = readIndex(spark, indexDir)
      .filter(col("batch_id") =!= batchId)
      .select("media_id", "sig", "verify")
    val (clean, _) = graft.ext.IncrementalDedup.addBatchHamming(
      index, batch, maxHamming, requireVerifyMatch, maxChunkFreq)

    withDynamicOverwrite(spark) {
      clean.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id").parquet(outDir)
      batch.select(col("media_id"), col("sig"), col("verify"))
        .filter(col("sig").isNotNull)
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id").parquet(indexDir)
    }
  }

  /** Start the stream: every micro-batch of fingerprint rows
    * (media_id, sig, verify) through [[processBatch]]. */
  def start(stream: DataFrame, maxHamming: Int, indexDir: String,
      outDir: String, checkpointDir: String,
      requireVerifyMatch: Boolean = false,
      maxChunkFreq: Option[Int] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        processBatch(b.toDF(), id, maxHamming, indexDir, outDir,
          requireVerifyMatch, maxChunkFreq)
      }
      .start()

  /** The accumulated (media_id, sig, verify, batch_id) index; empty
    * frame before the first batch commits. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    if (Option(new java.io.File(indexDir).list()).exists(_.nonEmpty))
      spark.read.parquet(indexDir)
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("media_id", LongType),
          StructField("sig", LongType), StructField("verify", LongType),
          StructField("batch_id", LongType))))
    }

  private def withDynamicOverwrite[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try f finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}

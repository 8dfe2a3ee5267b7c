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
  * queryable rollup is then re-merged from the consolidated history plus
  * recent partials (KB-sized: one row per key combination) and atomically
  * swapped, so replaying any batch reproduces the same rollup file. The
  * spec drives [[processBatch]] directly and replays a batch to pin it.
  *
  * COMPACTION (round 11): per-batch partials accumulate one partition per
  * micro-batch forever, so an unbounded run re-reads O(#batches) small
  * files per merge. Once `compactEvery` uncompacted partial partitions
  * exist, everything up to `batch_id ≤ current−2` is folded into ONE
  * consolidated snapshot under `<partialsDir>__compacted/upto=<id>`
  * (the merge algebra is associative, so fold ≡ re-merge), after which
  * the folded partials are garbage-collected. Crash-safety is by READ
  * DISCIPLINE, not write atomicity: every merge reads only the MAX-upto
  * snapshot plus partials with `batch_id > upto`, so a crash that leaves
  * both an old snapshot and undeleted folded partials behind changes
  * nothing (they are inert garbage, swept by the next compaction). The
  * `current−2` margin keeps replay safe: structured streaming only ever
  * re-fires the LATEST uncommitted batch, which is never in the fold —
  * its dynamic-overwrite partition stays the single source of truth.
  *
  * Registration: pass `registerAs`+`basePath` to (re-)register the
  * rollup for rewriting after every batch — re-registration is required
  * because the cached relation pins the pre-swap file listing. */
object StreamingRollup {

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Highest consolidated watermark on disk, if any. */
  private def maxUpto(spark: SparkSession, compactedDir: String): Option[Long] = {
    val fs = hadoopFs(spark, compactedDir)
    val p = new org.apache.hadoop.fs.Path(compactedDir)
    if (!fs.exists(p)) None
    else {
      val ids = fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("upto=")).map(_.stripPrefix("upto=").toLong)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** Uncompacted partial batch ids on disk (directory listing, no scan). */
  private def partialIds(spark: SparkSession, partialsDir: String): Seq[Long] = {
    val fs = hadoopFs(spark, partialsDir)
    val p = new org.apache.hadoop.fs.Path(partialsDir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch_id=")).map(_.stripPrefix("batch_id=").toLong)
      .toSeq
  }

  /** One micro-batch: write this batch's partials (idempotent), compact
    * the history when due, re-merge the rollup, swap, optionally
    * re-register.
    * @param compactEvery fold the partial history into one consolidated
    *   snapshot whenever this many uncompacted batch partitions exist. */
  def processBatch(batch: DataFrame, batchId: Long, keys: Seq[String],
      measures: Seq[String], partialsDir: String, mvPath: String,
      registerAs: Option[String] = None, basePath: String = "",
      compactEvery: Int = 16): Unit = {
    val spark = batch.sparkSession
    // dynamic overwrite scoped to THIS writer (never the session conf:
    // a session-wide flip would change the semantics of concurrent
    // overwrite writes on the same session)
    MaterializedRollup.build(batch, keys, measures)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(partialsDir)

    val compactedDir = partialsDir.stripSuffix("/") + "__compacted"
    val keyCols = keys.map(col)
    val aggs = MaterializedRollup.mergeAggs(measures)
    def snapshot(upto: Long): DataFrame =
      spark.read.parquet(s"$compactedDir/upto=$upto")

    // compaction: fold partials ≤ batchId−2 (replay-safe margin) beyond
    // the current watermark into a new consolidated snapshot, then GC
    val upto0 = maxUpto(spark, compactedDir)
    val newUpto = batchId - 2
    val foldable = partialIds(spark, partialsDir)
      .filter(id => id <= newUpto && upto0.forall(id > _))
    if (foldable.size >= compactEvery) {
      val toFold = spark.read.parquet(partialsDir)
        .filter(col("batch_id").isin(foldable: _*)).drop("batch_id")
      val folded = upto0.map(u => snapshot(u).unionByName(toFold))
        .getOrElse(toFold)
        .groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
      folded.withColumn("upto", lit(newUpto))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("upto").parquet(compactedDir)
      // GC is pure garbage collection: the read discipline below ignores
      // anything the new snapshot covers, so a crash mid-delete is inert.
      // Sweep EVERYTHING the new watermark covers — every partial with
      // batch_id ≤ newUpto (not just this fold's inputs: a crash mid-GC
      // orphans already-folded partials at ids ≤ the old watermark) and
      // every snapshot below the new max (not just the single previous
      // one) — so crash leftovers cannot accumulate across crashes.
      val fs = hadoopFs(spark, partialsDir)
      partialIds(spark, partialsDir).filter(_ <= newUpto).foreach { id =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$partialsDir/batch_id=$id"), true)
      }
      val cfs = hadoopFs(spark, compactedDir)
      cfs.listStatus(new org.apache.hadoop.fs.Path(compactedDir))
        .map(_.getPath.getName).filter(_.startsWith("upto="))
        .map(_.stripPrefix("upto=").toLong).filter(_ < newUpto)
        .foreach { u =>
          cfs.delete(new org.apache.hadoop.fs.Path(s"$compactedDir/upto=$u"), true)
        }
    }

    // queryable rollup: max-upto snapshot + partials beyond it — cost is
    // O(compactEvery) small partitions + one KB snapshot, not O(#batches)
    val upto1 = maxUpto(spark, compactedDir)
    val history = upto1 match {
      case Some(u) => snapshot(u).unionByName(
        spark.read.parquet(partialsDir)
          .filter(col("batch_id") > u).drop("batch_id"))
      case None => spark.read.parquet(partialsDir).drop("batch_id")
    }
    val merged = history.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val fs = hadoopFs(spark, mvPath)
    val tmp = mvPath + "__stream_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    MaterializedRollup.swapDir(fs, tmp, mvPath)
    // sessionScoped=false: this registration runs in the stream's CLONED
    // micro-batch session; the rollup is a shared artifact that must be
    // visible to the sessions actually querying the base
    registerAs.foreach { name =>
      MaterializedRollup.register(spark, name, basePath, mvPath, keys,
        measures, sessionScoped = false)
    }
  }

  /** Start the stream: every micro-batch of fact rows through
    * [[processBatch]]. */
  def start(stream: DataFrame, keys: Seq[String], measures: Seq[String],
      partialsDir: String, mvPath: String, checkpointDir: String,
      registerAs: Option[String] = None, basePath: String = "",
      compactEvery: Int = 16): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        processBatch(b.toDF(), id, keys, measures, partialsDir, mvPath,
          registerAs, basePath, compactEvery)
      }
      .start()

}

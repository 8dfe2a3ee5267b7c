package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.Upsert

/** Streaming CDC apply: maintain a queryable parquet SNAPSHOT of a keyed
  * change stream by applying every micro-batch as an upsert — the
  * "streaming materialized view" pattern (what Delta calls MERGE INTO
  * from foreachBatch), composed from the engine's own pieces:
  * latest-per-key dedup within the batch, [[graft.etl.Upsert]] against
  * the previous snapshot, versioned write + pointer swap.
  *
  * Consistency contract (object-store safe, no rename):
  *  - each batch writes a COMPLETE new snapshot under `dir/v=<batchId>`
  *    (write-once; a replayed batch after restart overwrites the same
  *    version directory, so reprocessing is idempotent);
  *  - `dir/_CURRENT` is a one-line pointer updated AFTER the write
  *    commits; readers resolve it then read an immutable directory —
  *    they never observe a half-written snapshot;
  *  - old versions stay until [[vacuum]] — time travel for free, exactly
  *    the manifest-pointer scheme table formats use, scaled down.
  *
  * Versions, not batch order, decide every conflict: within a batch the
  * highest `versionCol` per key survives, and across batches the apply
  * is VERSION-GUARDED ([[graft.etl.Upsert.upsertVersioned]]) — a change
  * replaces the snapshot row only when its version is ≥ the stored one.
  * Micro-batch boundaries are a delivery artifact (file pickup order is
  * arbitrary), so convergence must not depend on them: any arrival order
  * of the same change set folds to the same snapshot.
  *
  * Scale: the snapshot rewrite per batch is the honest cost of keyed
  * mutation over immutable parquet (every table format pays it as
  * file-level rewrite amplification; partition the snapshot when key
  * locality allows smaller rewrite scopes). The upsert itself shuffles
  * only delta keys against the base (see Upsert's scale note).
  */
object StreamingUpsert {

  /** Start applying `changes` (a streaming DataFrame) to the snapshot at
    * `dir`. Caller owns checkpointing via `checkpointDir`. */
  def run(changes: DataFrame, keys: Seq[String], versionCol: String,
      dir: String, checkpointDir: String): StreamingQuery = {
    val spark = changes.sparkSession
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(spark, batch, batchId, keys, versionCol, dir)
      }
      .start()
  }

  /** One micro-batch: dedupe to latest-per-key, upsert into the current
    * snapshot, publish as `v=<batchId>`. Public for batch-mode reuse and
    * deterministic testing. */
  def applyBatch(spark: SparkSession, batch: Dataset[Row], batchId: Long,
      keys: Seq[String], versionCol: String, dir: String): Unit = {
    // the pointer IS the commit marker: if it already names this batch
    // (or a later one), the batch committed before the restart — a replay
    // must be a no-op, not a self-referential rewrite of the directory it
    // would simultaneously be reading
    if (currentVersion(spark, dir)
        .exists(_.stripPrefix("v=").toLong >= batchId)) return
    if (batch.isEmpty) return
    val w = Window.partitionBy(keys.map(k => col(s"`$k`")): _*)
      .orderBy(col(s"`$versionCol`").desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val next = currentSnapshot(spark, dir) match {
      case Some(cur) => Upsert.upsertVersioned(cur, latest, keys, versionCol)
      case None => latest
    }
    val vdir = s"$dir/v=$batchId"
    next.write.mode("overwrite").option("compression", "snappy").parquet(vdir)
    publish(spark, dir, s"v=$batchId")
  }

  /** The current snapshot, or None before the first publish. */
  def currentSnapshot(spark: SparkSession, dir: String): Option[DataFrame] =
    currentVersion(spark, dir).map(v => spark.read.parquet(s"$dir/$v"))

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def currentVersion(spark: SparkSession, dir: String): Option[String] = {
    val f = fs(spark, dir)
    val p = new Path(s"$dir/_CURRENT")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim)
      finally in.close()
    }
  }

  private def publish(spark: SparkSession, dir: String, version: String): Unit = {
    val f = fs(spark, dir)
    val out = f.create(new Path(s"$dir/_CURRENT"), true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
  }

  /** Delete all versions older than the published one. */
  def vacuum(spark: SparkSession, dir: String): Unit =
    currentVersion(spark, dir).foreach { cur =>
      val f = fs(spark, dir)
      f.listStatus(new Path(dir))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v=")
          && s.getPath.getName != cur)
        .foreach(s => f.delete(s.getPath, true))
    }
}

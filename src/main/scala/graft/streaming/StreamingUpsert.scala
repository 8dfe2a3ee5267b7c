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
      val v = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      require(v.matches("v=\\d+"),
        s"corrupt snapshot pointer at $p: '$v' — restore it to the last good 'v=<n>'")
      Some(v)
    }
  }

  /** Publish via temp-write + OVERWRITE rename: a reader never observes
    * a truncated or empty pointer (FileContext rename with OVERWRITE is
    * the atomic pointer swap on posix/HDFS; on object stores the pointer
    * is one small object and its PUT is already atomic — there the
    * temp+rename degrades to copy+delete, equally safe for readers). */
  private def publish(spark: SparkSession, dir: String, version: String): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/_CURRENT.tmp")
    val dst = new Path(s"$dir/_CURRENT")
    val out = f.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dst.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Retention vacuum: delete versions STRICTLY OLDER than the published
    * one, RETAINING the newest `keep − 1` of them as a time-travel
    * window (`keep = 1` keeps only the current snapshot — the previous
    * all-or-nothing behavior). Never touches the current version or any
    * NEWER directory an in-flight batch may be writing; versions newer
    * than the pointer are in-flight state, not garbage. Safe to run
    * concurrently with readers of retained versions: deletion order is
    * oldest-first, and a reader that resolved `_CURRENT` can only be in
    * a retained directory. */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 1): Unit = {
    require(keep >= 1, "keep must be >= 1 (the current version always stays)")
    currentVersion(spark, dir).foreach { cur =>
      val curN = cur.stripPrefix("v=").toLong
      val f = fs(spark, dir)
      val older = f.listStatus(new Path(dir))
        .filter { s =>
          s.isDirectory && s.getPath.getName.startsWith("v=") &&
            scala.util.Try(s.getPath.getName.stripPrefix("v=").toLong)
              .toOption.exists(_ < curN)
        }
        .sortBy(s => s.getPath.getName.stripPrefix("v=").toLong)
      older.dropRight(keep - 1).foreach(s => f.delete(s.getPath, true))
    }
  }

  /** Change-data-feed read face (the `table_changes(from, to)` analog):
    * keyed added/removed/changed rows between two RETAINED versions,
    * computed with [[graft.etl.SnapshotDiff]] over the immutable version
    * directories — so a consumer can subscribe to "what changed" without
    * replaying the change stream itself. Exact struct comparison (the
    * versions are engine-written; width is the snapshot's own). */
  def changes(spark: SparkSession, dir: String, fromBatchId: Long,
      toBatchId: Long, keys: Seq[String]): DataFrame = {
    require(fromBatchId < toBatchId,
      s"from ($fromBatchId) must precede to ($toBatchId)")
    graft.etl.SnapshotDiff.diff(
      snapshotAt(spark, dir, fromBatchId),
      snapshotAt(spark, dir, toBatchId), keys, exact = true)
  }

  /** Read a RETAINED historical version (time travel). Fails with the
    * available versions listed when `batchId` was vacuumed or never
    * published. */
  def snapshotAt(spark: SparkSession, dir: String, batchId: Long): DataFrame = {
    // only PUBLISHED versions are readable: a directory newer than the
    // pointer may be a half-written in-flight batch
    val curN = currentVersion(spark, dir).map(_.stripPrefix("v=").toLong)
    require(curN.exists(batchId <= _),
      s"version v=$batchId is not published yet (current: ${curN.fold("none")(n => s"v=$n")})")
    val f = fs(spark, dir)
    val p = new Path(s"$dir/v=$batchId")
    if (!f.exists(p)) {
      val have = f.listStatus(new Path(dir))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
        .map(_.getPath.getName).sorted.mkString(", ")
      throw new IllegalArgumentException(
        s"version v=$batchId not available at $dir (have: $have)")
    }
    spark.read.parquet(p.toString)
  }
}

package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X92 — targeted deletion (right-to-be-forgotten / takedown erasure):
  * remove every row whose key appears in a delete set from a
  * hive-partitioned parquet table, rewriting ONLY the partitions that
  * contain hits.
  *
  * The 100 TB reality: erasure requests name a few thousand keys, the
  * table holds billions of rows across thousands of partitions, and a
  * naive `filter + full overwrite` rewrites everything. This operator
  * makes the rewrite surgical:
  *  1. hit scan — one column-pruned pass over (partition, key),
  *     broadcast-left-joined with the delete set; aggregates to the
  *     DISTINCT affected partition values + per-partition hit counts
  *     (a partitions-sized relation, tiny);
  *  2. staged rewrite — rows of AFFECTED partitions only (a partition-
  *     pruned scan), anti-joined with the delete set, written to a
  *     staging directory (Spark refuses to overwrite a path it is
  *     reading — and staging is what makes step 3 near-atomic anyway);
  *  3. per-partition swap — each affected partition directory is deleted
  *     and its staged replacement renamed in (two filesystem metadata
  *     ops); a partition whose every row was deleted has no staged dir
  *     and is simply removed. Every unaffected partition's files are
  *     NEVER touched (byte-identical, spec-pinned).
  *
  * Returns a per-partition report (rows_before, deleted, rows_after) —
  * the erasure audit trail. The delete set is assumed request-sized
  * (broadcast); for a corpus-sized delete set, pre-filter with
  * [[graft.ext.BloomPrune]] and fall back to a full rewrite.
  *
  * Deletion is by KEY EQUALITY, null-safe: a NULL key in the delete set
  * deletes NULL-keyed rows — erasure must not leak rows behind SQL null
  * semantics, so both joins use `<=>`.
  */
object Forget {

  /** One row per affected partition value (stringified; NULL partition
    * values report as the hive default-partition name). */
  final case class PartitionDelete(partition: String, rowsBefore: Long,
      deleted: Long, rowsAfter: Long)

  final case class Report(partitions: Seq[PartitionDelete]) {
    def deletedTotal: Long = partitions.map(_.deleted).sum
    def rewrittenPartitions: Int = partitions.count(p => p.rowsAfter > 0)
    def removedPartitions: Int = partitions.count(_.rowsAfter == 0)
  }

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Delete `keys` (any frame carrying `keyCol`) from the parquet table at
    * `tableDir` partitioned by `partitionCol`. */
  def deleteKeys(spark: SparkSession, tableDir: String, partitionCol: String,
      keyCol: String, keys: DataFrame): Report = {
    val table = spark.read.parquet(tableDir)
    require(table.columns.contains(partitionCol),
      s"$partitionCol is not a column of $tableDir")
    require(table.columns.contains(keyCol),
      s"$keyCol is not a column of $tableDir")
    val delKeys = broadcast(keys.select(col(keyCol).as("__del_key"))
      .distinct().withColumn("__hit", lit(1)))

    // 1. hit scan: per-partition (row count, hit count) in ONE pass —
    //    column-pruned to (partition, key), the delete set broadcast.
    //    The __hit indicator survives the join even for NULL keys (which
    //    match via <=> but carry a NULL __del_key).
    val stats = table.select(col(partitionCol).as("__p"), col(keyCol))
      .join(delKeys, col(keyCol) <=> col("__del_key"), "left")
      .groupBy(col("__p"))
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col("__hit"), lit(0))).as("__hits"))
      .collect()
    val affected = stats.filter(_.getLong(2) > 0)
    if (affected.isEmpty) return Report(Nil)

    val affectedVals = affected.map(_.get(0)).toSeq
    val affectedCol = affectedVals.map(v =>
      if (v == null) col(partitionCol).isNull
      else col(partitionCol) <=> lit(v)).reduce(_ || _)

    // 2. staged rewrite of affected partitions' survivors
    val staging = tableDir.stripSuffix("/") + "__forget_tmp"
    table.filter(affectedCol)
      .join(delKeys, col(keyCol) <=> col("__del_key"), "left_anti")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(staging)

    // 3. per-partition swap; fully-deleted partitions have nothing staged
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // hive-escaped directory names, exactly as Spark's writer renders them
    // (special characters like space/'='/'%' in string partition values)
    def dirName(v: Any): String =
      s"$partitionCol=" + (if (v == null) HiveDefaultPartition
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v.toString))
    affected.foreach { r =>
      val d = dirName(r.get(0))
      val dst = new org.apache.hadoop.fs.Path(s"$tableDir/$d")
      val src = new org.apache.hadoop.fs.Path(s"$staging/$d")
      fs.delete(dst, true)
      if (fs.exists(src)) {
        require(fs.rename(src, dst), s"partition swap failed for $d")
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)

    Report(affected.map { r =>
      val (n, hits) = (r.getLong(1), r.getLong(2))
      PartitionDelete(
        if (r.get(0) == null) HiveDefaultPartition else r.get(0).toString,
        n, hits, n - hits)
    }.sortBy(_.partition).toSeq)
  }

  /** One row per expired partition. */
  final case class PartitionExpiry(partition: String, rowsDropped: Long)

  /** Retention sweep (TTL): drop every partition whose VALUE fails
    * `retain` — e.g. `retain = col("day") >= "2026-01-01"`. No data page
    * is ever read: partition values come from the file index (a metadata
    * listing), the predicate evaluates on a |partitions|-row relation,
    * and expiry is one directory delete per failing partition; the row
    * counts in the report come from parquet FOOTERS of the dropped
    * partitions only. The complement of [[deleteKeys]]: deleteKeys
    * erases rows surgically INSIDE partitions; this retires whole
    * partitions — the daily lifecycle job at 100 TB. */
  def expirePartitions(spark: SparkSession, tableDir: String,
      partitionCol: String,
      retain: org.apache.spark.sql.Column): Seq[PartitionExpiry] = {
    val table = spark.read.parquet(tableDir)
    require(table.columns.contains(partitionCol),
      s"$partitionCol is not a column of $tableDir")
    val expired = table.select(col(partitionCol)).distinct()
      .filter(!retain).collect().map(_.get(0))
    if (expired.isEmpty) return Nil
    val expiredCol = expired.map(v =>
      if (v == null) col(partitionCol).isNull
      else col(partitionCol) <=> lit(v)).reduce(_ || _)
    // footer-only count of what is being dropped (metadata rows)
    val counts = table.filter(expiredCol)
      .groupBy(col(partitionCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    expired.foreach { v =>
      val d = s"$partitionCol=" + (if (v == null) HiveDefaultPartition
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v.toString))
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$d"), true)
    }
    expired.map(v => PartitionExpiry(
      if (v == null) HiveDefaultPartition else v.toString,
      counts.getOrElse(String.valueOf(v), 0L))).sortBy(_.partition).toSeq
  }
}

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
  *  3. per-partition swap — each affected partition directory is MOVED
  *     ASIDE (into the staging area) and its staged replacement renamed
  *     in (two filesystem metadata ops). The previous copy is never
  *     deleted while it is the only copy: a crash or rename failure
  *     between the two renames is recovered by the next run's preamble,
  *     which restores any moved-aside partition missing from the table
  *     before clearing staging. A partition whose every row was deleted
  *     has no staged dir and ends removed. Every unaffected partition's
  *     files are NEVER touched (byte-identical, spec-pinned).
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

  /** Unregister every [[graft.plans.RollupViewRewrite]] view whose base is
    * this table: after any erasure (key delete OR retention sweep) a
    * registered rollup still aggregates the removed rows, so queries on
    * the base would silently keep serving them. Callers re-register after
    * rebuilding the rollup from the mutated table. */
  private def invalidateRollups(spark: SparkSession, tableDir: String): Unit = {
    val canonBase = {
      val pth = new org.apache.hadoop.fs.Path(tableDir)
      pth.getFileSystem(spark.sessionState.newHadoopConf())
        .makeQualified(pth).toString
    }
    graft.plans.RollupViewRewrite.registered
      .filter(_.basePath == canonBase)
      .foreach(v => graft.plans.RollupViewRewrite.unregister(v.name))
  }

  /** Delete `keys` (any frame carrying `keyCol`) from the parquet table at
    * `tableDir` partitioned by `partitionCol`. */
  def deleteKeys(spark: SparkSession, tableDir: String, partitionCol: String,
      keyCol: String, keys: DataFrame): Report = {
    // FIRST: recover from a crashed prior swap. Step 3 moves each hit
    // partition aside to staging/__old/<dir> before installing its
    // replacement, so a crash between the two renames leaves the
    // partition missing from the table with its only full copy in
    // staging — restore any such partition BEFORE the hit scan reads the
    // table (and before staging is cleared, which would destroy it).
    val staging = tableDir.stripSuffix("/") + "__forget_tmp"
    val stagingFs = new org.apache.hadoop.fs.Path(staging).getFileSystem(
      spark.sessionState.newHadoopConf())
    val oldRoot = new org.apache.hadoop.fs.Path(s"$staging/__old")
    if (stagingFs.exists(oldRoot)) {
      stagingFs.listStatus(oldRoot).foreach { st =>
        val back = new org.apache.hadoop.fs.Path(
          s"$tableDir/${st.getPath.getName}")
        if (!stagingFs.exists(back)) {
          require(stagingFs.rename(st.getPath, back),
            s"crash recovery failed restoring ${st.getPath} to $back")
        }
      }
    }
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
    // __ps = Spark's OWN cast-to-string rendering of the partition value
    // (session timezone for timestamps) — the writer derives directory
    // names from exactly this string, so dirName below can never drift
    // from the on-disk layout the way Any.toString can (a
    // java.sql.Timestamp's toString is JVM-timezone + trailing ".0")
    val stats = table.select(col(partitionCol).as("__p"),
        col(partitionCol).cast("string").as("__ps"), col(keyCol))
      .join(delKeys, col(keyCol) <=> col("__del_key"), "left")
      .groupBy(col("__p"))
      .agg(first(col("__ps")).as("__ps"), count(lit(1)).as("__n"),
        sum(coalesce(col("__hit"), lit(0))).as("__hits"))
      .collect()
    val affected = stats.filter(_.getLong(3) > 0)
    if (affected.isEmpty) return Report(Nil)

    val affectedVals = affected.map(_.get(0)).toSeq
    val affectedCol = affectedVals.map(v =>
      if (v == null) col(partitionCol).isNull
      else col(partitionCol) <=> lit(v)).reduce(_ || _)

    // the engine's own rollup rewrite must not keep serving the erased
    // rows' aggregates: invalidate every registered view over this base
    // (re-register after rebuilding the rollup from the erased table)
    invalidateRollups(spark, tableDir)

    // 2. staged rewrite of affected partitions' survivors (staging
    //    cleared first — recovery above already salvaged anything a
    //    crashed prior run left as the only copy; what remains is a prior
    //    run's stale output that must never be swapped in as this run's)
    stagingFs.delete(new org.apache.hadoop.fs.Path(staging), true)
    table.filter(affectedCol)
      .join(delKeys, col(keyCol) <=> col("__del_key"), "left_anti")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(staging)

    // 3. per-partition swap; fully-deleted partitions have nothing staged
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // hive-escaped directory names from the CAST string (see __ps above),
    // exactly as Spark's writer renders them
    def dirName(castStr: String): String =
      s"$partitionCol=" + (if (castStr == null) HiveDefaultPartition
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(castStr))
    affected.foreach { r =>
      val d = dirName(r.getString(1))
      val dst = new org.apache.hadoop.fs.Path(s"$tableDir/$d")
      val src = new org.apache.hadoop.fs.Path(s"$staging/$d")
      // the hit partition MUST exist on disk — a miss means the rendered
      // name diverged from the layout, and silently skipping it would
      // report rows as deleted while leaving them readable
      require(fs.exists(dst),
        s"partition directory $d not found under $tableDir " +
          "(partition-value rendering mismatch) — aborting; partitions " +
          "swapped before this one are already rewritten")
      // move-aside swap (the MaterializedRollup.swapDir discipline): the
      // previous copy is renamed out of the table FIRST — never deleted
      // while it is the only copy — so a crash or rename failure at any
      // point leaves the partition either in place or recoverable from
      // __old (the recovery preamble above restores it on the next run).
      // The aside location lives under staging, NOT dst+"__old": a
      // directory named `col=val__old` inside the table would be read
      // back as a partition value and resurrect the rows.
      val aside = new org.apache.hadoop.fs.Path(s"$staging/__old/$d")
      fs.mkdirs(aside.getParent)
      require(fs.rename(dst, aside), s"partition swap failed moving $d aside")
      if (fs.exists(src)) {
        if (!fs.rename(src, dst)) {
          fs.rename(aside, dst) // restore the previous copy
          throw new IllegalStateException(s"partition swap failed for $d")
        }
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)

    Report(affected.map { r =>
      val (n, hits) = (r.getLong(2), r.getLong(3))
      PartitionDelete(
        if (r.getString(1) == null) HiveDefaultPartition else r.getString(1),
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
    // a partition expires unless retain is definitively TRUE: a NULL
    // predicate result (e.g. a null partition value under a >= bound)
    // ages out rather than surviving every sweep unreported — malformed
    // data is exactly what a lifecycle job most needs to retire
    val expiredRows = table
      .select(col(partitionCol).as("__p"),
        col(partitionCol).cast("string").as("__ps"))
      .distinct()
      .filter(!coalesce(retain, lit(false)))
      .collect()
    if (expiredRows.isEmpty) return Nil
    // retired partitions' rows must stop being served by rollups too —
    // the deleteKeys contract, mirrored (a retention sweep that leaves a
    // registered rollup in place silently serves expired data)
    invalidateRollups(spark, tableDir)
    val expiredCol = expiredRows.map(_.get(0)).map(v =>
      if (v == null) col(partitionCol).isNull
      else col(partitionCol) <=> lit(v)).reduce(_ || _)
    // footer-only count of what is being dropped (metadata rows)
    val counts = table.filter(expiredCol)
      .groupBy(col(partitionCol).cast("string")).agg(count(lit(1)).as("n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    expiredRows.foreach { r =>
      // directory names from Spark's own cast-to-string rendering (the
      // deleteKeys __ps contract)
      val d = s"$partitionCol=" + (if (r.getString(1) == null) HiveDefaultPartition
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(r.getString(1)))
      val dst = new org.apache.hadoop.fs.Path(s"$tableDir/$d")
      require(fs.exists(dst),
        s"partition directory $d not found under $tableDir " +
          "(partition-value rendering mismatch)")
      fs.delete(dst, true)
    }
    expiredRows.map { r =>
      val name =
        if (r.getString(1) == null) HiveDefaultPartition else r.getString(1)
      PartitionExpiry(name, counts.getOrElse(String.valueOf(r.getString(1)), 0L))
    }.sortBy(_.partition).toSeq
  }
}

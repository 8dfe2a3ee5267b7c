package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located join path for repeated big-big
  * joins (SURVEY §2.1/S5 extended for the 100 TB story).
  *
  * A fact table bucketed on its join key is pre-shuffled ON DISK: every
  * bucket b of `left` holds exactly the keys that hash to b, so a join with
  * a table bucketed the same way (same key, same bucket count) needs NO
  * exchange at query time — Spark plans a sort-merge join directly over the
  * matching bucket files. At 100 TB this converts the dominant per-query
  * shuffle (TBs over the network, repeated by every consumer) into a
  * one-time layout cost at write time, the same trade the reference makes
  * when it materializes hour-aggregated output for all later queries
  * (`/root/reference/README.md:222-226`).
  *
  * Writing also `sortBy`s the bucket columns so each bucket file is
  * key-sorted — the merge side of the join can stream instead of sorting.
  */
object Bucketing {

  /** Write `df` as a bucketed external table at `path`, registered as
    * `table` in the session catalog (bucketing metadata lives in the
    * catalog — a plain parquet dir has no bucket spec).
    * Buckets default to sorted on the bucket keys. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      buckets: Int, keys: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val sorts = if (sortCols.nonEmpty) sortCols else keys
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two identically-bucketed catalog tables on `keys`.
    * With matching bucket specs both sides scan co-located bucket files and
    * the plan contains no Exchange. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)

  /** True iff the physical plan moves no data between partitions (no
    * shuffle exchange) — the property bucketing buys. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}

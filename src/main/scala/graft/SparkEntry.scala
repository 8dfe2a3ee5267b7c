package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtQueries, Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the saved-query-3 shape (join + group + distinct count) — the
    * richest of the reference's Athena queries. */
  def entry(spark: SparkSession): DataFrame =
    // flagship: the composed corpus pipeline (dedup → screens → split →
    // token accounting), every stage an engine operator — see
    // ExtQueries.x0_pipeline
    ExtQueries.x0_pipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Queries.queries ++ ExtQueries.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check (Tier B). */
  def oracleSql: Map[String, String] =
    Queries.oracleSql ++ ExtQueries.oracleSql
}

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

  /** Declared-TERMINAL Tier-B faces (SURVEY §5.3): each measures a lossy
    * perceptual/trained-model recall no SQL engine can replay, and each
    * names its oracle-green exact-regime sibling exercising the same
    * operator code. A `queries` key that is neither in [[oracleSql]] nor
    * here is a GAP, not a contract — keep this the exhaustive list. */
  def tierB: Map[String, String] = Map(
    "x84_image_neardup" -> "x84_image_dedup",
    "x85_audio_neardup" -> "x85_audio_dedup",
    "x87_video_neardup" -> "x87_video_dedup",
    "x90_pq_topk" -> "x90_pq_exact",
    // saturated-regime KMV estimates: gated in-face at 3/sqrt(k-2)
    // against exactly-computed truths; the exact regime is the oracle
    // sibling (r15 verdict #5)
    "x98_sketch_overlap_sat" -> "x98_sketch_overlap")
}

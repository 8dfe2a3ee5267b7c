package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KmvFunctions._

/** X98 — corpus set algebra via KMV theta sketches
  * ([[graft.functions.KmvSketch]]): per-slice distinct / overlap /
  * difference cardinalities between two corpora, computed from bounded
  * KB-sized sketches instead of a corpus×corpus content join.
  *
  * The 100 TB shape: each side is ONE partial-aggregated scan down to
  * |slices| sketch rows (≤ 8k bytes each on the shuffle — the map-side
  * combine keeps at most k longs per slice per task); the report is an
  * equi-join of two slice-sized tables. X15/X62 answer "WHICH documents
  * overlap" (exact, join-shaped); this answers "HOW MUCH overlaps, per
  * slice" at scan cost — the triage you run BEFORE committing to the
  * exact join, and the dedup-planning statistic (expected savings per
  * source) X72 reports only within one corpus.
  *
  * Exactness: sketches that never saturate (distinct < k per slice)
  * yield EXACT counts — the x98 oracle face pins that regime against
  * DuckDB's COUNT(DISTINCT)/INTERSECT. Saturated sketches degrade to
  * (k−1)/θ estimates with relative error ~1/√(k−2) (Beyer et al. 2007);
  * the spec gates the estimate error at k=512 over 20k distinct keys.
  * Keys are xxhash64 of the content — the same 2⁻⁶⁴-collision trade as
  * X1 content dedup.
  */
object SetSketch {

  /** One KMV sketch row per slice: `sliceCols..., sketch`. NULL keys are
    * excluded (guarded BEFORE xxhash64 — Spark's hash of NULL is the
    * seed, not NULL, and a phantom seed-row would count as a value). */
  def sketchBy(df: DataFrame, sliceCols: Seq[String], keyCol: Column,
      k: Int = 4096, out: String = "sketch"): DataFrame =
    df.groupBy(sliceCols.map(c => col(s"`$c`")): _*)
      .agg(kmvSketch(when(keyCol.isNotNull, xxhash64(keyCol)), k).as(out))

  /** Per-slice overlap report between corpora `a` and `b`:
    * (slice..., a_distinct, b_distinct, overlap, a_only, b_only) —
    * whole-valued doubles in the exact regime. Slices present in only
    * one corpus report zero overlap and their own distinct count. */
  def overlapReport(a: DataFrame, b: DataFrame, sliceCols: Seq[String],
      keyCol: Column, k: Int = 4096): DataFrame = {
    val sa = sketchBy(a, sliceCols, keyCol, k, "__ska")
    val sb = sketchBy(b, sliceCols, keyCol, k, "__skb")
    // full outer: a slice on one side only is a report row, not a drop;
    // an absent sketch contributes empty-set semantics via the k=2 zero
    // sketch (exact, nothing shared)
    val empty = lit(graft.functions.KmvSketch.toBytes(2, Array.empty[Long]))
    sa.join(sb, sliceCols, "full_outer")
      .withColumn("__ska", coalesce(col("__ska"), empty))
      .withColumn("__skb", coalesce(col("__skb"), empty))
      .select(sliceCols.map(c => col(s"`$c`")) ++ Seq(
        kmvEstimate(col("__ska")).as("a_distinct"),
        kmvEstimate(col("__skb")).as("b_distinct"),
        kmvIntersectEstimate(col("__ska"), col("__skb")).as("overlap"),
        kmvDifferenceEstimate(col("__ska"), col("__skb")).as("a_only"),
        kmvDifferenceEstimate(col("__skb"), col("__ska")).as("b_only")): _*)
  }
}

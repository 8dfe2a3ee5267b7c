package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable frequency sketches (the Count-Min side of the rollup-store
  * family — [[graft.queries.ExtQueries.x8_hll_merge]] covers
  * cardinality; this covers per-item FREQUENCY). Per-group sketches are
  * built with Spark's builtin `count_min_sketch` aggregate (partial-
  * aggregated like any agg, binary payload out); group sketches merge
  * CELL-WISE into region/global rollups without touching raw data again.
  *
  * Merge exactness: two CMS built with the same (eps, confidence, seed)
  * share hash functions, so merging is element-wise counter addition —
  * `merged.estimateCount(x)` is IDENTICAL to the sketch built over the
  * concatenated input, not merely close (property-tested). Estimates
  * carry the usual one-sided CMS error: est ≥ true, and
  * est ≤ true + eps·N with probability ≥ confidence.
  *
  * The merge itself runs driver-side over the handful of group sketches
  * (sketch count = group count, KBs each); at 100 TB the heavy part —
  * sketching the raw rows — stays fully distributed.
  */
object Freq {

  /** One CMS per group over `valueCol` (binary column `sketch`). */
  def sketchPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.groupBy(col(s"`$groupCol`"))
      .agg(expr(s"count_min_sketch(`$valueCol`, ${eps}d, ${confidence}d, $seed)")
        .as("sketch"))

  /** Merge group sketches (same eps/confidence/seed) into one. */
  def merge(sketches: Seq[Array[Byte]]): CountMinSketch = {
    require(sketches.nonEmpty, "nothing to merge")
    val merged = read(sketches.head)
    sketches.tail.foreach(b => merged.mergeInPlace(read(b)))
    merged
  }

  def read(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  /** Rollup demo: per-group sketches → merged global sketch → point
    * estimates for `items`, alongside per-group estimates. Returns
    * (group, item, est) with group "ALL" for the merged sketch. */
  def estimateRollup(spark: SparkSession, perGroup: DataFrame,
      items: Seq[Long]): DataFrame = {
    import spark.implicits._
    val rows: Seq[(String, Array[Byte])] = perGroup.collect().toSeq.map {
      // String.valueOf: NULL is a legal SQL group and must not NPE
      r => (String.valueOf(r.get(0)), r.getAs[Array[Byte]]("sketch"))
    }
    val all = ("ALL", merge(rows.map(_._2)))
    val est = (rows.map { case (g, b) => (g, read(b)) } :+ all).flatMap {
      case (g, sk) => items.map(i => (g, i, sk.estimateCount(java.lang.Long.valueOf(i))))
    }
    est.toDF("segment", "item", "est")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) statistics — the outlier screen that
  * actually works on pipeline telemetry and data-quality metrics, where
  * mean/stddev are themselves dragged by the outliers they are supposed
  * to find. MAD = median(|x − median(x)|); a point is anomalous when
  * |x − median| > k·MAD (k≈3–5 ≈ the robust analog of z > 2–3.4).
  *
  * Plan shape: two exact-median aggregations (groups × 1 rows each) with
  * the tiny group-stats relations broadcast back onto the rows — rows
  * shuffle only for the aggregations themselves, and the final screen is
  * a row-local comparison at scan speed. The branch-off-scan re-read
  * (input is scanned once per aggregation pass — SURVEY §6.3) is the
  * honest cost of exact medians; swap in `approx_percentile(0.5)` via
  * `approxMedians = true` to collapse the screen to one pass when
  * 1%-quantile error is acceptable (it usually is for outlier screens).
  *
  * The stats relation is broadcast on the assumption that outlier
  * screens group by COARSE dimensions (entity types, sources, shards —
  * thousands of groups, not millions). A high-cardinality key would
  * make the broadcast itself the problem; drop the `broadcast()` hints
  * and let AQE pick a shuffled join in that regime.
  */
object Robust {

  /** Per-group (median, MAD) of `valueCol`. */
  def madStats(df: DataFrame, keyCols: Seq[String], valueCol: String,
      approxMedians: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val keys = keyCols.map(k => col(s"`$k`"))
    val x = col(s"`$valueCol`")
    def med(c: Column): Column =
      if (approxMedians) percentile_approx(c, lit(0.5), lit(10000)) else median(c)
    val m1 = df.groupBy(keys: _*).agg(med(x).as("__med"))
    df.join(broadcast(m1), keyCols)
      .groupBy(keys: _*)
      .agg(first(col("__med")).as("med"),
        med(abs(x - col("__med"))).as("mad"))
  }

  /** Rows flagged with `outlierCol` = 1 when |x − median| > k·MAD within
    * their group (0 otherwise; a zero-MAD group flags everything not
    * equal to the median — degenerate but well-defined). */
  def flagOutliers(df: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Double = 5.0, outlierCol: String = "is_outlier",
      approxMedians: Boolean = false): DataFrame = {
    val stats = madStats(df, keyCols, valueCol, approxMedians)
    df.join(broadcast(stats), keyCols)
      .withColumn(outlierCol,
        when(abs(col(s"`$valueCol`") - col("med")) > lit(k) * col("mad"), lit(1))
          .otherwise(lit(0)))
  }
}

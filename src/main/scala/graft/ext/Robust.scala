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

  /** Per-group (median, MAD) of `valueCol`.
    *
    * Exact-median machinery is chosen by the optimizer's SIZE ESTIMATE
    * (the q14 broadcast-gate pattern): below the threshold the builtin
    * `median()` aggregate runs — it buffers each group's values, which
    * is fast while groups fit comfortably in executor memory (measured
    * 0.7 s vs 3.3 s for the selection path at the 10× bench set, whose
    * multi-stage fixed cost dominates small inputs); above it (or for
    * any single-key input the estimate deems large) the medians run
    * through [[Quantiles.exactQuantiles]] — distributed selection, NO
    * per-group buffering, so a billion-row group cannot OOM an executor
    * (measured time-neutral at the 100× set: both paths are scan-bound
    * there, but only selection is memory-bounded). Composite keys always
    * use the buffered path (the coarse-screen assumption). Both engines
    * produce the same interpolated-median semantics (pinned by q51's
    * oracle). */
  def madStats(df: DataFrame, keyCols: Seq[String], valueCol: String,
      approxMedians: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val keys = keyCols.map(k => col(s"`$k`"))
    val x = col(s"`$valueCol`")
    // calibrated against the plan-stats scale: the 10×/100× bench inputs
    // estimate at ~10 MB / ~104 MB for a 3-column events projection, so
    // 48 MB ≈ tens of millions of rows — the regime where per-group
    // value buffers (rows/groups × 8 B, group count unknowable here)
    // start to threaten task memory
    val big = df.queryExecution.optimizedPlan.stats.sizeInBytes > (48L << 20)
    if (!approxMedians && keyCols.size == 1 && big) {
      val g = keyCols.head
      val m1 = Quantiles.exactQuantiles(df, g, Seq((valueCol, 0.5, "med")))
      val dev = df.join(broadcast(m1), Seq(g))
        .withColumn("__dev", abs(x - col("med")))
      val m2 = Quantiles.exactQuantiles(dev, g, Seq(("__dev", 0.5, "mad")))
      m1.join(m2, Seq(g))
    } else {
      def med(c: Column): Column =
        if (approxMedians) percentile_approx(c, lit(0.5), lit(10000)) else median(c)
      val m1 = df.groupBy(keys: _*).agg(med(x).as("__med"))
      df.join(broadcast(m1), keyCols)
        .groupBy(keys: _*)
        .agg(first(col("__med")).as("med"),
          med(abs(x - col("__med"))).as("mad"))
    }
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

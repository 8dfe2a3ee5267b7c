package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification + linear interpolation — the gap-fill shape
  * every sensor/telemetry pipeline needs downstream of the reference's
  * hourly aggregation (`transform.py:53-120` produces per-hour rows only
  * for hours that HAD data; consumers of a regular grid must fill the
  * holes). Two faces:
  *
  *  - [[densify]]: per-key regular spine from each key's own [min, max]
  *    over a fixed step, observed values left-joined on.
  *  - [[linear]]: densify + linear interpolation between the nearest
  *    non-null neighbors; leading/trailing gaps clamp to the nearest
  *    observed value (constant extrapolation).
  *
  * Scale shape: the spine is generated per key with `sequence()` —
  * row-local explode, no driver loop, no global range join; the join back
  * to observations is a per-key equi-join; the neighbor search is two
  * window passes (running last / reversed-frame first with ignoreNulls),
  * which shuffle once on the key. Nothing here is sensitive to the
  * number of keys — a 100 TB run with 1e9 keys partitions by key hash
  * exactly like any windowed aggregate. Degenerate inputs are safe by
  * construction: a key with one observation yields a 1-row spine; gaps
  * at the edges have one NULL neighbor and clamp.
  */
object Interpolate {

  /** Per-key regular time spine (each key's own [min(time), max(time)]
    * in `step` increments) with observed values attached; missing cells
    * hold NULL in `valueCol`. `step` is a SQL interval, e.g. "INTERVAL 1 HOUR". */
  def densify(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, step: String = "INTERVAL 1 HOUR"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val keys = keyCols.map(k => col(s"`$k`"))
    val spans = df.groupBy(keys: _*)
      .agg(min(col(timeCol)).as("__hmin"), max(col(timeCol)).as("__hmax"))
    val spine = spans.select(keys :+
      explode(sequence(col("__hmin"), col("__hmax"), expr(step))).as(timeCol): _*)
    spine.join(df.select(keys :+ col(timeCol) :+ col(valueCol): _*),
      keyCols :+ timeCol, "left")
  }

  /** Densified series with linear interpolation over interior gaps and
    * constant extrapolation at the edges. Adds `filledCol` (0 = observed,
    * 1 = synthesized) so downstream consumers can weight accordingly. */
  def linear(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, step: String = "INTERVAL 1 HOUR",
      filledCol: String = "filled"): DataFrame = {
    val dense = densify(df, keyCols, timeCol, valueCol, step)
    val keys = keyCols.map(k => col(s"`$k`"))
    val v = col(s"`$valueCol`")
    val ts = col(s"`$timeCol`")
    val wPrev = Window.partitionBy(keys: _*).orderBy(ts)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keys: _*).orderBy(ts)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTime = when(v.isNotNull, ts)
    val pv = last(v, ignoreNulls = true).over(wPrev)
    val ph = last(obsTime, ignoreNulls = true).over(wPrev)
    val nv = first(v, ignoreNulls = true).over(wNext)
    val nh = first(obsTime, ignoreNulls = true).over(wNext)
    // epoch seconds as DOUBLE before the divide: the identical operation
    // order the oracle uses, so results match bit-for-bit modulo ROUND
    def ratio(a: Column, b: Column): Column =
      (unix_timestamp(a) - unix_timestamp(b)).cast("double")
    val interp = when(v.isNotNull, v)
      .when(pv.isNull, nv)
      .when(nv.isNull, pv)
      .otherwise(pv + (nv - pv) * (ratio(ts, ph) / ratio(nh, ph)))
    dense
      .withColumn(filledCol, when(v.isNotNull, lit(0)).otherwise(lit(1)))
      .withColumn(valueCol, interp)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row at or
  * before its timestamp, per key — the canonical timeseries-enrichment
  * operator (e.g. events ⟕ latest metadata revision).
  *
  * Spark-first composition (preference (a) over a custom SparkPlan): tag
  * both sides, UNION them, and run one `last(..., ignoreNulls)` window over
  * (key, time) — a single hash-shuffle on the key plus a per-partition sort,
  * exactly the cost of the sort-merge join a custom operator would
  * implement, with AQE/codegen/spill handling inherited for free. No
  * crossJoin, no per-key driver loops; survives arbitrarily many rows per
  * key at 100 TB.
  *
  * `tolerance` (ms) optionally voids matches older than `leftTime - tol`.
  */
object AsOfJoin {

  /** @param left      probe side (each row gets enriched)
    * @param right     reference side (rows valid from their timestamp on)
    * @param keyCols   equi-key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime validity-start column on `right`
    * @param payload   right-side columns to carry (default: all non-key,
    *                  non-time columns)
    * @param toleranceMs max staleness; None = unbounded */
  def apply(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String] = Nil,
      toleranceMs: Option[Long] = None): DataFrame = {

    val payloadCols =
      if (payload.nonEmpty) payload
      else right.columns.toSeq.diff(keyCols :+ rightTime)
    val leftCols = left.columns.toSeq
    val clash = payloadCols.intersect(leftCols)
    require(clash.isEmpty,
      s"as-of payload columns collide with left columns: ${clash.mkString(", ")} " +
        "- rename the right side before joining")

    // tagged union: right rows carry payload, left rows carry nulls
    val unifiedTime = "__t"
    val l = left
      .withColumn(unifiedTime, col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__rt", lit(null).cast("timestamp"))
    val lWithNullPayload = payloadCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn(unifiedTime, col(rightTime))
      .withColumn("__is_left", lit(0))
      .withColumn("__rt", col(rightTime))
    val rWithPayload = payloadCols.foldLeft(r)((df, c) =>
      df.withColumn(s"__p_$c", col(c)))
    val rProjected = rWithPayload.select(
      (keyCols.map(col) :+ col(unifiedTime) :+ col("__is_left") :+ col("__rt")) ++
        payloadCols.map(c => col(s"__p_$c")) ++
        leftCols.diff(keyCols).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lProjected = lWithNullPayload.select(
      (keyCols.map(col) :+ col(unifiedTime) :+ col("__is_left") :+ col("__rt")) ++
        payloadCols.map(c => col(s"__p_$c")) ++
        leftCols.diff(keyCols).map(col): _*)

    // right rows sort before left rows at the same instant (a reference row
    // AT the event time is visible to it)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(unifiedTime), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lProjected.unionByName(rProjected)
      .withColumn("__match_t", last(col("__rt"), ignoreNulls = true).over(w))
    val withPayload = payloadCols.foldLeft(filled)((df, c) =>
      df.withColumn(s"__p_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w)))

    // staleness compared at microsecond precision (timestamp resolution):
    // cast("long") would truncate to whole seconds and void sub-second
    // tolerances entirely
    val stale: Column = toleranceMs match {
      case Some(tol) =>
        col("__match_t").isNull ||
          unix_micros(col(unifiedTime)) - unix_micros(col("__match_t")) > tol * 1000L
      case None => col("__match_t").isNull
    }
    val result = withPayload
      .filter(col("__is_left") === 1)
      .select(
        (keyCols.map(col) ++ leftCols.diff(keyCols).map(col)) ++
          payloadCols.map(c => when(stale, lit(null)).otherwise(col(s"__p_$c")).as(c)) :+
          when(stale, lit(null)).otherwise(col("__match_t")).as("asof_time"): _*)
    result
  }
}

/** Range join: left.value ∈ [right.lo, right.hi), composed as a binned
  * equi-join (preference (a)): both sides explode to their overlapping bins
  * of width `binWidth`, equi-join on (bin), then the exact predicate
  * filters residuals. Shuffle cost is O(rows × bins-per-interval) instead
  * of the crossJoin a naive theta-join plans; choose `binWidth` ≈ median
  * interval length so intervals span O(1) bins. */
object RangeJoin {
  def binned(
      left: DataFrame, valueCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    val l = left.withColumn("__bin", floor(col(valueCol) / binWidth).cast("long"))
    val r = right.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor((col(hiCol) - lit(1e-9)) / binWidth).cast("long"))))
    l.join(r, "__bin")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}

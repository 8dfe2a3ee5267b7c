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
  *
  * Tie semantics: when the right side has MULTIPLE rows at the same
  * (key, rightTime), which one matches is arbitrary (the window's sort is
  * not total there) — the same contract as DuckDB/pandas ASOF. For a
  * deterministic result, pre-aggregate the right side to one row per
  * (key, time) first (e.g. groupBy(key, time).agg(max(payload))).
  */
object AsOfJoin {

  /** @param left      probe side (each row gets enriched)
    * @param right     reference side (rows valid from their timestamp on)
    * @param keyCols   equi-key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime validity-start column on `right`
    * @param payload   right-side columns to carry (default: all non-key,
    *                  non-time columns)
    * @param toleranceMs max staleness; None = unbounded
    * @param direction "backward" (most recent right row at or before the
    *                  event — the default) or "forward" (next right row
    *                  at or after it); same plan either way, only the
    *                  scan order flips
    * @param matchTimeCol output column carrying the matched right time */
  def apply(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String] = Nil,
      toleranceMs: Option[Long] = None,
      direction: String = "backward",
      matchTimeCol: String = "asof_time"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"

    // backtick-quote every caller-supplied name: the engine's own metadata
    // schema has dotted columns (`in.state`, SchemaDefs), which bare col()
    // would mis-parse as struct access
    def qcol(name: String): Column = col(s"`$name`")

    val payloadCols =
      if (payload.nonEmpty) payload
      else right.columns.toSeq.diff(keyCols :+ rightTime)
    val leftCols = left.columns.toSeq
    val clash = payloadCols.intersect(leftCols)
    require(clash.isEmpty,
      s"as-of payload columns collide with left columns: ${clash.mkString(", ")} " +
        "- rename the right side before joining")

    // tagged union. The match time AND every payload column travel in ONE
    // struct (null on left rows), so a single last(ignoreNulls) picks the
    // whole matched right row atomically — per-column last() would
    // resurrect older revisions' values wherever the matched revision
    // carries a legitimate NULL, and could mix fields across revisions.
    val unifiedTime = "__t"
    val packFields = qcol(rightTime).as("rt") +:
      payloadCols.zipWithIndex.map { case (c, i) => qcol(c).as(s"p_$i") }
    val rProjected = right.select(
      (keyCols.map(qcol) :+ qcol(rightTime).as(unifiedTime) :+
        lit(0).as("__is_left") :+ struct(packFields: _*).as("__pack")) ++
        leftCols.diff(keyCols).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val packType = rProjected.schema("__pack").dataType
    val lProjected = left.select(
      (keyCols.map(qcol) :+ qcol(leftTime).as(unifiedTime) :+
        lit(1).as("__is_left") :+ lit(null).cast(packType).as("__pack")) ++
        leftCols.diff(keyCols).map(qcol): _*)

    // right rows sort before left rows at the same instant (a reference row
    // AT the event time is visible to it)
    val w = Window.partitionBy(keyCols.map(qcol): _*)
      .orderBy(if (fwd) col(unifiedTime).desc else col(unifiedTime).asc,
        col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lProjected.unionByName(rProjected)
      .withColumn("__m", last(col("__pack"), ignoreNulls = true).over(w))
    val matchT = col("__m").getField("rt")

    // staleness compared at microsecond precision (timestamp resolution):
    // cast("long") would truncate to whole seconds and void sub-second
    // tolerances entirely
    val signedAge: Column =
      if (fwd) unix_micros(matchT) - unix_micros(col(unifiedTime))
      else unix_micros(col(unifiedTime)) - unix_micros(matchT)
    val stale: Column = toleranceMs match {
      case Some(tol) => matchT.isNull || signedAge > tol * 1000L
      case None => matchT.isNull
    }
    filled
      .filter(col("__is_left") === 1)
      .select(
        (keyCols.map(qcol) ++ leftCols.diff(keyCols).map(qcol)) ++
          payloadCols.zipWithIndex.map { case (c, i) =>
            when(stale, lit(null)).otherwise(col("__m").getField(s"p_$i")).as(c)
          } :+
          when(stale, lit(null)).otherwise(matchT).as(matchTimeCol): _*)
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

/** Nearest-in-time join (X55): attach to each left row the right row
  * minimizing |t_left − t_right| within the key — event attribution,
  * sensor alignment, nearest-snapshot enrichment. Composed from TWO
  * as-of passes (backward, then forward over the enriched relation) and
  * a row-local winner pick: |Δ| ties go BACKWARD (equivalently: order
  * candidates by (|Δ|, right time) and take the first). Cost = two
  * sorted-window scans on the same key partitioning — no candidate
  * explosion, no self-join; the second pass reuses the first's shuffle
  * partitioning. */
object NearestJoin {

  def apply(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String] = Nil,
      toleranceMs: Option[Long] = None): DataFrame = {
    def qcol(name: String): Column = col(s"`$name`")
    val payloadCols =
      if (payload.nonEmpty) payload
      else right.columns.toSeq.diff(keyCols :+ rightTime)

    def renamed(suffix: String): DataFrame =
      right.select((keyCols.map(qcol) :+ qcol(rightTime)) ++
        payloadCols.map(c => qcol(c).as(s"$c$suffix")): _*)

    val back = AsOfJoin(left, renamed("__b"), keyCols, leftTime, rightTime,
      payloadCols.map(_ + "__b"), toleranceMs, "backward", "__tb")
    val both = AsOfJoin(back, renamed("__f"), keyCols, leftTime, rightTime,
      payloadCols.map(_ + "__f"), toleranceMs, "forward", "__tf")

    val lt = unix_micros(qcol(leftTime))
    val useBack = col("__tf").isNull ||
      (col("__tb").isNotNull &&
        (lt - unix_micros(col("__tb")) <= unix_micros(col("__tf")) - lt))
    both.select(
      left.columns.toSeq.map(qcol) ++
        payloadCols.map(c =>
          when(useBack, qcol(s"${c}__b")).otherwise(qcol(s"${c}__f")).as(c)) :+
        when(useBack, col("__tb")).otherwise(col("__tf")).as("nearest_time"): _*)
  }
}

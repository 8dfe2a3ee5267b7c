package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampType}

/** Dataset profiling — the pre-flight audit a training-data pipeline runs
  * before committing 100 TB to a transform: per-column null rates, distinct
  * estimates, numeric ranges, string lengths.
  *
  * ONE aggregation pass over the data (every statistic is an algebraic or
  * sketch aggregate, so partial aggregation applies and the scan happens
  * once); output pivots to one row per column driver-side — the profile
  * itself is k×stats tiny. Distinct counts use HLL++
  * (`approx_count_distinct`) because exact distinct per column would be a
  * shuffle per column at scale.
  */
object Profile {

  /** One row per column: name, type, rows, nulls, null_frac,
    * approx_distinct, min/max (rendered as strings), mean (numeric only),
    * mean_len (string only). */
  def describe(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: fields.flatMap { f =>
      val c = col(s"`${f.name}`")
      // min/max need an ordering — skip them (null) for unorderable types
      // like map<> instead of failing the whole profile
      val orderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType)
      val base = Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nulls_${f.name}"),
        // HLL needs a hashable input — maps aren't; report 0 distinct there
        (if (orderable) approx_count_distinct(c) else lit(0L))
          .as(s"__dist_${f.name}"),
        (if (orderable) min(c).cast("string") else lit(null).cast("string"))
          .as(s"__min_${f.name}"),
        (if (orderable) max(c).cast("string") else lit(null).cast("string"))
          .as(s"__max_${f.name}"))
      val typed = f.dataType match {
        case _: NumericType => Seq(avg(c.cast("double")).as(s"__mean_${f.name}"))
        case StringType => Seq(avg(length(c).cast("double")).as(s"__mean_${f.name}"))
        case _: TimestampType | _: DateType => Seq(lit(null).cast("double").as(s"__mean_${f.name}"))
        case _ => Seq(lit(null).cast("double").as(s"__mean_${f.name}"))
      }
      base ++ typed
    }.toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val rows = row.getAs[Long]("__rows")
    val out = fields.map { f =>
      val nulls = row.getAs[Long](s"__nulls_${f.name}")
      (f.name, f.dataType.catalogString, rows, nulls,
        if (rows == 0) 0.0 else nulls.toDouble / rows,
        row.getAs[Long](s"__dist_${f.name}"),
        Option(row.getAs[String](s"__min_${f.name}")).orNull,
        Option(row.getAs[String](s"__max_${f.name}")).orNull,
        if (row.isNullAt(row.fieldIndex(s"__mean_${f.name}"))) None
        else Some(row.getAs[Double](s"__mean_${f.name}")))
    }
    out.toSeq.toDF("column", "type", "rows", "nulls", "null_frac",
      "approx_distinct", "min", "max", "mean")
  }
}

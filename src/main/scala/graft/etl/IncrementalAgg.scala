package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregate rollups: keep a
  * materialized per-key state of (count, sum, min, max) per measure and
  * fold new rows in WITHOUT rescanning history — the exact-aggregate
  * companion of the sketch rollups (X13 HLL cardinality, X22 Count-Min
  * frequency), and the aggregation-level analog of [[JobRunner]]'s
  * incremental file-manifest runs: at 100 TB you re-aggregate the day's
  * delta, never the table.
  *
  * Only ALGEBRAIC aggregates are maintainable this way (combine of
  * partials ≡ aggregate of union — the same property Spark's own
  * partial/final hash aggregation relies upon): count, sum, min, max,
  * and anything derivable from maintained state (mean = sum/count).
  * Holistic aggregates (exact median, exact distinct) need their own
  * machinery — that is precisely what X13/X22 sketches are for.
  *
  * Plan shape: `update` aggregates ONLY the delta (one shuffle of delta
  * rows), then merges two narrow state relations grouped by key — the
  * base state is touched once, no wide rows move, and the merge is a
  * union + re-aggregate that AQE plans as a small shuffle. Deletions are
  * out of scope (count/sum of a retracted row is expressible, min/max is
  * not without keeping per-key heaps; route deletions through a full
  * rebuild of affected partitions, the standard lakehouse answer).
  */
object IncrementalAgg {

  private def stateCols(measures: Seq[String]): Seq[String] =
    "cnt" +: measures.flatMap(m => Seq(s"sum_$m", s"min_$m", s"max_$m"))

  /** Aggregate raw rows into rollup state (also the bootstrap). */
  def aggregate(rows: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "keys and measures required")
    val aggs = count(lit(1)).as("cnt") +: measures.flatMap { m =>
      val c = col(s"`$m`")
      Seq(sum(c).as(s"sum_$m"), min(c).as(s"min_$m"), max(c).as(s"max_$m"))
    }
    rows.groupBy(keys.map(k => col(s"`$k`")): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Combine two states (same schema): the algebraic merge. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs = sum(col("cnt")).as("cnt") +: measures.flatMap { m =>
      Seq(sum(col(s"`sum_$m`")).as(s"sum_$m"),
        min(col(s"`min_$m`")).as(s"min_$m"),
        max(col(s"`max_$m`")).as(s"max_$m"))
    }
    val cols = (keys ++ stateCols(measures)).map(c => col(s"`$c`"))
    a.select(cols: _*).unionByName(b.select(cols: _*))
      .groupBy(keys.map(k => col(s"`$k`")): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold delta ROWS into an existing state: aggregate the delta, merge. */
  def update(state: DataFrame, deltaRows: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame =
    merge(state, aggregate(deltaRows, keys, measures), keys, measures)

  /** Reader face: state + derived columns (mean per measure). */
  def withDerived(state: DataFrame, measures: Seq[String]): DataFrame =
    measures.foldLeft(state) { (df, m) =>
      df.withColumn(s"mean_$m", col(s"`sum_$m`") / col("cnt"))
    }
}

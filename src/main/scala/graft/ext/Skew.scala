package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY "salting for skew").
  *
  * AQE's skew-join handling covers sort-merge joins automatically; these
  * helpers cover the remaining hot-key patterns:
  *
  *  - [[saltedAggregate]]: two-phase aggregation for group-bys where a few
  *    keys dominate — phase 1 aggregates (key, salt) partials across
  *    `saltFactor` reducers, phase 2 merges per key. Functions must be
  *    algebraic (re-aggregatable): sum/count/min/max.
  *  - [[saltedBroadcastLeft]]: replicate a small right side `saltFactor`
  *    times so a skewed large left joins against salted copies instead of
  *    funneling a hot key through one task.
  */
object Skew {

  /** Two-phase salted aggregation.
    * @param aggs (inputCol → (phase1Agg, phase2Agg, outName)); e.g.
    *             sum/sum, count/sum, min/min, max/max. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      countCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    // backtick-quote user names: the engine's energy measures are dotted
    def qc(c: String) = col(s"`$c`")
    val phase1 =
      countCols.map(c => count(qc(c)).as(s"__cnt_$c")) ++
        sumCols.map(c => sum(qc(c)).as(s"__sum_$c")) ++
        minCols.map(c => min(qc(c)).as(s"__min_$c")) ++
        maxCols.map(c => max(qc(c)).as(s"__max_$c"))
    require(phase1.nonEmpty, "no aggregates requested")
    val p1 = salted
      .groupBy((keys.map(qc) :+ col("__salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
    val phase2 =
      countCols.map(c => sum(qc(s"__cnt_$c")).as(s"${c}_count")) ++
        sumCols.map(c => sum(qc(s"__sum_$c")).as(s"${c}_sum")) ++
        minCols.map(c => min(qc(s"__min_$c")).as(s"${c}_min")) ++
        maxCols.map(c => max(qc(s"__max_$c")).as(s"${c}_max"))
    p1.groupBy(keys.map(qc): _*).agg(phase2.head, phase2.tail: _*)
  }

  /** Salted broadcast join for a skewed LEFT against a small RIGHT: the left
    * gets a random salt in [0, saltFactor), the right is exploded once per
    * salt value, and the equi-join key becomes (key, salt) — hot keys spread
    * over `saltFactor` tasks. Right side must be broadcast-small. */
  def saltedBroadcastLeft(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(saltFactor)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<bigint>")))
    saltedLeft.join(broadcast(saltedRight),
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}

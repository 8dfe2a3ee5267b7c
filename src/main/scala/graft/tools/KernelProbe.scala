package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core

/** Round-15: A/B the last sf100 >2x kernel constants (r14 verdict #3).
  *   q19  — count-distinct over raw text vs over xxhash64(text)
  *   q06  — string group keys vs ascii-code int keys (dictionary-ish)
  * Usage: KernelProbe [sfDir]
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val spark = core.Sessions.local(appName = "graft-kernelprobe")

    def docs = core.Tables.load(spark, sfDir, "documents")
    def l = core.Tables.load(spark, sfDir, "lineitem")

    def q19_raw: DataFrame = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        countDistinct(col("text")).as("distinct_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("lang"))
    def q19_hash: DataFrame = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        countDistinct(xxhash64(col("text"))).as("distinct_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("lang"))

    def q06_str: DataFrame = l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    def q06_int: DataFrame = l
      .groupBy(ascii(col("l_returnflag")).as("rf"),
        ascii(col("l_linestatus")).as("ls"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .select(char(col("rf")).as("l_returnflag"), char(col("ls")).as("l_linestatus"),
        col("cnt"), col("sum_qty"), col("sum_price"), col("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

    val variants = Seq(
      "q19_raw" -> (() => q19_raw), "q19_hash" -> (() => q19_hash),
      "q06_str" -> (() => q06_str), "q06_int" -> (() => q06_int))
    for ((name, mk) <- variants) {
      mk().write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[kern] $name%-9s median=${ts.sorted.apply(1)}%.2f s  " +
        ts.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Round-10 floor adjudication for q10/q11 (single-scan set-op rewrite):
  * is the residual vs DuckDB a plan defect or Spark's constant for ONE
  * filtered scan + ONE hash shuffle on the custkey? Compares the
  * committed queries against progressively barer plans of the same
  * shape. `runMain graft.tools.Q10Probe [sfDir] [reps]` */
object Q10Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(appName = "graft-q10probe")

    def orders() = graft.core.Tables.load(spark, sfDir, "orders")

    def time(name: String)(body: => Long): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE $name%-26s run$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      Console.flush()
    }

    time("q10-current") {
      graft.queries.Queries.q10_except(spark, sfDir).collect().length.toLong
    }
    time("q11-current") {
      graft.queries.Queries.q11_intersect(spark, sfDir).collect().length.toLong
    }
    time("bare-grpby-filtered") {
      // same scan + same shuffle, trivial aggregate, no sort, 1-row out
      orders().filter(col("o_orderstatus").isin("F", "O"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).collect().length.toLong
    }
    time("bare-grpby-flags") {
      // q10's exact aggregate, result only COUNTED (no sort/collect)
      orders().filter(col("o_orderstatus").isin("F", "O"))
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderstatus") === "F").as("__f"),
          max(col("o_orderstatus") === "O").as("__o"))
        .filter(col("__f") && !col("__o"))
        .agg(count(lit(1))).collect().length.toLong
    }
    time("bare-scan-count") {
      orders().filter(col("o_orderstatus").isin("F", "O"))
        .agg(count(lit(1))).collect().length.toLong
    }

    spark.stop()
  }
}

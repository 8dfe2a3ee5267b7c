package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 floor probe for q83 (PIT lookup): the committed SHJ over a
  * two-scan union-built history vs (a) a single-scan inline()-built
  * history, (b) the same with broadcast, (c) sort-merge, and (d) the
  * component floors (bare orders shuffle-agg; bare hist build).
  * `runMain graft.tools.Q83Probe [sfDir] [reps]` */
object Q83Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(appName = "graft-q83probe")

    def customer(): DataFrame = graft.core.Tables.load(spark, sfDir, "customer")
    def orders(): DataFrame = graft.core.Tables.load(spark, sfDir, "orders")

    def time(name: String)(body: => Long): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE $name%-24s run$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      Console.flush()
    }

    val cut = lit("1995-06-01").cast("timestamp")

    // history built in ONE customer scan: two interval structs inlined
    def histInline(): DataFrame = customer().select(col("c_custkey").as("k"),
        inline(array(
          struct(lit("1992-01-01").cast("timestamp").as("vfrom"),
            cut.as("vto"), round(col("c_acctbal"), 2).as("bal")),
          struct(cut.as("vfrom"), lit(null).cast("timestamp").as("vto"),
            round(col("c_acctbal") + 1000, 2).as("bal")))))
      .select(col("k"), col("vfrom"), col("vto"), col("bal"))

    def histUnion(): DataFrame = {
      val c = customer()
      c.select(col("c_custkey").as("k"),
          lit("1992-01-01").cast("timestamp").as("vfrom"), cut.as("vto"),
          round(col("c_acctbal"), 2).as("bal"))
        .unionByName(c.select(col("c_custkey").as("k"),
          cut.as("vfrom"), lit(null).cast("timestamp").as("vto"),
          round(col("c_acctbal") + 1000, 2).as("bal")))
    }

    def pit(hist: DataFrame, hinted: DataFrame => DataFrame): Long = {
      val o = orders()
      val h = hinted(hist)
      o.join(h,
          o("o_custkey") === h("k") && o("o_orderdate") >= h("vfrom") &&
            (h("vto").isNull || o("o_orderdate") < h("vto")))
        .groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), round(sum(col("bal")), 2).as("bal_sum"))
        .collect().length.toLong
    }

    time("q83-current(union+shj)") { pit(histUnion(), _.hint("shuffle_hash")) }
    time("inline+shj") { pit(histInline(), _.hint("shuffle_hash")) }
    time("inline+bcast") { pit(histInline(), h => broadcast(h)) }
    time("inline+smj") { pit(histInline(), _.hint("merge")) }
    time("floor:orders-grpagg") {
      orders().groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).collect().length.toLong
    }
    time("floor:hist-build") { histInline().agg(count(lit(1))).head.getLong(0) }

    spark.stop()
  }
}

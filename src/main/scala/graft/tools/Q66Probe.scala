package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perf probe for q66 (Checks.validate) at a given SF dir: the current
  * composition, each constraint class in isolation, and candidate fused
  * shapes; plus A/B for the q10/q11 single-scan set-op rewrites.
  * `runMain graft.tools.Q66Probe [sfDir] [reps]` */
object Q66Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(appName = "graft-q66probe")

    def orders(): DataFrame = graft.core.Tables.load(spark, sfDir, "orders")
    def customer(): DataFrame = graft.core.Tables.load(spark, sfDir, "customer")

    def time(name: String)(body: => Long): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE $name%-24s run$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      Console.flush()
    }

    import graft.ext.Checks._
    time("q66-current") {
      graft.queries.Queries.q66_quality(spark, sfDir).collect().length.toLong
    }
    time("row-local-only") {
      validate(orders(), Seq(
        NotNull("o_custkey"), InRange("o_totalprice", 0.0, 300000.0),
        Satisfies("o_status_domain", col("o_orderstatus").isin("O", "F", "P"))
      )).collect().length.toLong
    }
    time("unique-only") {
      validate(orders(), Seq(Unique(Seq("o_orderkey")))).collect().length.toLong
    }
    time("ref-only") {
      validate(orders(), Seq(
        RefIntegrity(Seq("o_custkey"), customer(), Seq("c_custkey"))
      )).collect().length.toLong
    }
    time("ref-bcast") {
      val probe = orders().select(col("o_custkey")).na.drop(Seq("o_custkey"))
      val refKeys = customer().select(col("c_custkey").as("o_custkey")).distinct()
      probe.join(broadcast(refKeys), Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations")).collect().head.getLong(0)
    }
    time("unique-fused-rowlocal") {
      // one groupBy(key) pass carrying the row-local violation sums
      orders()
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("__n"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn"),
          sum(when(col("o_totalprice") < 0.0 || col("o_totalprice") > 300000.0,
            1L).otherwise(0L)).as("rng"),
          sum(when(!coalesce(col("o_orderstatus").isin("O", "F", "P"),
            lit(false)), 1L).otherwise(0L)).as("dom"))
        .agg(sum(col("__n") - 1L).as("uq"), sum(col("nn")).as("nn"),
          sum(col("rng")).as("rng"), sum(col("dom")).as("dom"))
        .collect().length.toLong
    }
    time("ref-preagg") {
      // pre-aggregate probe keys so the anti-join moves |distinct| rows
      val probe = orders().na.drop(Seq("o_custkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("__c"))
      val refKeys = customer().select(col("c_custkey").as("o_custkey")).distinct()
      probe.join(refKeys, Seq("o_custkey"), "left_anti")
        .agg(coalesce(sum(col("__c")), lit(0L)).as("violations"))
        .collect().head.getLong(0)
    }
    time("q66-fused-all") {
      val o = orders()
      val uniq = o.groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("__n"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn"),
          sum(when(col("o_totalprice") < 0.0 || col("o_totalprice") > 300000.0,
            1L).otherwise(0L)).as("rng"),
          sum(when(!coalesce(col("o_orderstatus").isin("O", "F", "P"),
            lit(false)), 1L).otherwise(0L)).as("dom"))
        .agg(sum(col("__n") - 1L).as("uq"), sum(col("nn")).as("nn"),
          sum(col("rng")).as("rng"), sum(col("dom")).as("dom"))
      val probe = o.na.drop(Seq("o_custkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("__c"))
      val refKeys = customer().select(col("c_custkey").as("o_custkey")).distinct()
      val ref = probe.join(refKeys, Seq("o_custkey"), "left_anti")
        .agg(coalesce(sum(col("__c")), lit(0L)).as("violations"))
      uniq.crossJoin(ref).collect().length.toLong
    }
    time("q10-new") {
      graft.queries.Queries.q10_except(spark, sfDir).collect().length.toLong
    }
    time("q11-new") {
      graft.queries.Queries.q11_intersect(spark, sfDir).collect().length.toLong
    }

    spark.stop()
  }
}

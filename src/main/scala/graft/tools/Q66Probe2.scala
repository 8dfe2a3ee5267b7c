package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 follow-up probe for q66 (Checks.validate): candidate shapes
  * beyond Q66Probe's — (a) shared cached narrow projection feeding all
  * three branches, (b) Bloom-fused referential check (certain violations
  * counted in the fact scan; only bloom-positive survivors see the exact
  * join), (c) bloom + fused row-local in one scan.
  * `runMain graft.tools.Q66Probe2 [sfDir] [reps]` */
object Q66Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(appName = "graft-q66probe2")

    def orders(): DataFrame = graft.core.Tables.load(spark, sfDir, "orders")
    def customer(): DataFrame = graft.core.Tables.load(spark, sfDir, "customer")

    def time(name: String)(body: => Long): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE $name%-24s run$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      Console.flush()
    }

    time("cached-narrow") {
      import graft.ext.Checks._
      val narrow = orders().select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice")).cache()
      try {
        narrow.count() // materialize
        validate(narrow, Seq(
          NotNull("o_custkey"),
          InRange("o_totalprice", 0.0, 300000.0),
          Satisfies("o_status_domain", col("o_orderstatus").isin("O", "F", "P")),
          Unique(Seq("o_orderkey")),
          RefIntegrity(Seq("o_custkey"), customer(), Seq("c_custkey"))
        )).collect().length.toLong
      } finally narrow.unpersist()
    }

    time("bloom-ref") {
      // bloom over ref keys; fact rows failing the bloom are CERTAIN
      // violations (no false negatives); bloom-positive non-null keys
      // that are genuinely absent are caught by an exact join of the
      // tiny survivor set against the ref
      import graft.functions.BloomFunctions.{bloomBuild, bloomMightContain}
      val nBits = 1 << 27 // 16 MB: ~9 bits/key for 15M keys, fp ~1.4%
      val refKeys = customer().select(col("c_custkey").as("k")).na.drop()
      val bf = refKeys
        .agg(bloomBuild(xxhash64(col("k")), nBits, 5).as("bf"))
        .head().getAs[Array[Byte]](0)
      val probe = orders().select(col("o_custkey").as("k")).na.drop()
      val certain = probe.agg(
        sum(when(!bloomMightContain(lit(bf), xxhash64(col("k")), 5), 1L)
          .otherwise(0L)).as("certain")).head().getLong(0)
      // per-key counts of the (tiny) bloom-positive survivor set, exact
      val maybes = probe
        .filter(bloomMightContain(lit(bf), xxhash64(col("k")), 5))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
      val fpViol = maybes.join(refKeys, Seq("k"), "left_anti")
        .agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0)
      certain + fpViol
    }

    time("ref-shuffle-hash") {
      // plain anti-join but with shuffle-hash hint (skip the sort)
      val probe = orders().select(col("o_custkey")).na.drop(Seq("o_custkey"))
      val refKeys = customer().select(col("c_custkey").as("o_custkey")).distinct()
      probe.join(refKeys.hint("shuffle_hash"), Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations")).collect().head.getLong(0)
    }

    time("unique-2phase") {
      // count(*) - count(distinct key) as a single agg (Expand-based)
      orders().agg((count(lit(1)) - countDistinct(col("o_orderkey")))
        .as("violations")).collect().head.getLong(0)
    }

    spark.stop()
  }
}

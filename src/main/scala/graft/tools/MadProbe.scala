package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ext.{Quantiles, Robust}

/** Perf probe for the Q77 robust-outlier plan shapes at a given SF dir:
  * (a) the current big-input path (2× distributed selection),
  * (b) the same with the projected input persisted across passes,
  * (c) the buffered builtin median() path (what the size gate rejects),
  * (d) percentile_approx.
  * `runMain graft.tools.MadProbe [sfDir] [reps]` */
object MadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(appName = "graft-madprobe")

    def input(): DataFrame = graft.core.Tables.load(spark, sfDir, "events")
      .select(col("event_type").as("g"),
        (col("value") * when(col("event_id") % 97 === 0, 20.0).otherwise(1.0))
          .as("x"))

    def q77Tail(flagged: DataFrame): Long = flagged
      .groupBy(col("g"))
      .agg(sum(col("is_outlier")).as("n_outliers"), count(lit(1)).as("n"),
        round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("madv"))
      .count()

    def time(name: String)(body: => Long): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = body
      println(f"MAD $name%-22s run$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      Console.flush()
    }

    time("current-selection") {
      q77Tail(Robust.flagOutliers(input(), Seq("g"), "x", k = 5.0))
    }

    time("selection-persisted") {
      val v = input().persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val m1 = Quantiles.exactQuantiles(v, "g", Seq(("x", 0.5, "med")))
        val dev = v.join(broadcast(m1), Seq("g"))
          .withColumn("__dev", abs(col("x") - col("med")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val m2 = Quantiles.exactQuantiles(dev, "g", Seq(("__dev", 0.5, "mad")))
        val stats = m1.join(m2, Seq("g"))
        val flagged = v.join(broadcast(stats), Seq("g"))
          .withColumn("is_outlier",
            when(abs(col("x") - col("med")) > lit(5.0) * col("mad"), lit(1))
              .otherwise(lit(0)))
        val n = q77Tail(flagged)
        dev.unpersist(false)
        n
      } finally v.unpersist(false)
    }

    time("buffered-median") {
      val v = input()
      val m1 = v.groupBy(col("g")).agg(median(col("x")).as("__med"))
      val stats = v.join(broadcast(m1), Seq("g"))
        .groupBy(col("g"))
        .agg(first(col("__med")).as("med"),
          median(abs(col("x") - col("__med"))).as("mad"))
      val flagged = v.join(broadcast(stats), Seq("g"))
        .withColumn("is_outlier",
          when(abs(col("x") - col("med")) > lit(5.0) * col("mad"), lit(1))
            .otherwise(lit(0)))
      q77Tail(flagged)
    }

    time("approx") {
      q77Tail(Robust.flagOutliers(input(), Seq("g"), "x", k = 5.0,
        approxMedians = true))
    }

    time("histogram") {
      val v = input()
      val stats = Robust.madStatsHistogram(v, Seq("g"), "x")
      val flagged = v.join(broadcast(stats), Seq("g"))
        .withColumn("is_outlier",
          when(abs(col("x") - col("med")) > lit(5.0) * col("mad"), lit(1))
            .otherwise(lit(0)))
      q77Tail(flagged)
    }

    spark.stop()
  }
}

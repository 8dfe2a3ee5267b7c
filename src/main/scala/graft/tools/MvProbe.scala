package graft.tools

import org.apache.spark.sql.functions._

import graft.etl.MaterializedRollup
import graft.plans.RollupViewRewrite

/** X91 scale probe: the dashboard aggregation (key-only filter + coarse
  * group + COUNT/SUM/MIN/MAX/AVG over lineitem) timed direct vs rerouted
  * through a registered rollup at a given SF dir. Also times the rollup
  * build (the once-per-refresh cost the reroute amortizes) and
  * applyDelta. Warm medians of 5; results journaled in SURVEY §6.9. */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.core.Sessions.local(appName = "mv-probe")
    val root = java.nio.file.Files.createTempDirectory("graft_mv_probe").toString
    val base = graft.core.Tables.load(spark, dir, "lineitem")

    def q() = base
      .filter(col("l_linestatus") === "F")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        round(avg(col("l_extendedprice")) + 1e-9, 4).as("avg_price"))
      .orderBy(col("l_returnflag"))

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(n: Int)(f: => Unit): Double = {
      val ts = Seq.fill(n)(time(f)).sorted; ts(n / 2)
    }

    val direct = median(5)(q().collect())
    println(f"direct (rule off, no view):        $direct%.3f s")

    val buildS = time {
      MaterializedRollup.createAndRegister(spark, "probe", s"$dir/lineitem.parquet",
        s"$root/mv", keys = Seq("l_returnflag", "l_linestatus"),
        measures = Seq("l_quantity", "l_extendedprice"))
    }
    println(f"rollup build+register (once):      $buildS%.3f s")

    val rerouted = median(5)(q().collect())
    println(f"rerouted through the rollup:       $rerouted%.3f s")
    println(f"speedup:                           ${direct / rerouted}%.1fx")

    val deltaS = time {
      MaterializedRollup.applyDelta(spark, "probe", base.limit(100000))
    }
    println(f"applyDelta (100k-row delta):       $deltaS%.3f s")

    RollupViewRewrite.clear()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}

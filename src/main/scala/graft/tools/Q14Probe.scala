package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core

/** Round-15 A/B for the q14 sf10 drift (r14 verdict "what's wrong" #2):
  * the only per-query move outside the host-drift band after the r14
  * BigInt-clamp diff. Variants:
  *   repart  — the shipped path: both sides repartition(p, key) + SHJ hint
  *   hint    — plain SHUFFLE_HASH hint, EnsureRequirements does the
  *             shuffles (AQE free to coalesce)
  *   smj     — no hint (planner default) for reference
  * Usage: Q14Probe [sfDir]
  */
object Q14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val spark = core.Sessions.local(appName = "graft-q14probe")

    def l = core.Tables.load(spark, sfDir, "lineitem")
    def o = core.Tables.load(spark, sfDir, "orders")

    def finish(j: DataFrame): DataFrame = j
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

    def repart: DataFrame = {
      val oBytes = o.queryExecution.optimizedPlan.stats.sizeInBytes
      val shuf = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val p = math.max(shuf, ((oBytes / (32L << 20)) min BigInt(10000)).toInt + 1)
      val lp = l.repartition(p, col("l_orderkey"))
      val op = o.repartition(p, col("o_orderkey")).hint("SHUFFLE_HASH")
      finish(lp.join(op, lp("l_orderkey") === op("o_orderkey")
        && lp("l_shipdate") > op("o_orderdate")))
    }
    def hint: DataFrame = {
      val op = o.hint("SHUFFLE_HASH")
      finish(l.join(op, l("l_orderkey") === op("o_orderkey")
        && l("l_shipdate") > op("o_orderdate")))
    }
    def smj: DataFrame = finish(
      l.join(o, l("l_orderkey") === o("o_orderkey")
        && l("l_shipdate") > o("o_orderdate")))

    val variants = Seq("repart" -> (() => repart), "hint" -> (() => hint),
      "smj" -> (() => smj))
    for ((name, mk) <- variants) {
      mk().write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q14] $name%-7s median=${ts.sorted.apply(1)}%.2f s  " +
        ts.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}

package graft.tools

import graft.core
import org.apache.spark.sql.functions._

/** One-off experiment: how much of a small sorted query's wall time is the
  * global-sort machinery (range-boundary sample pass re-executing the scan,
  * plus the extra stage) vs the scan itself. */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = core.Sessions.local(appName = "graft-sortprobe")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach(_ => mk.write.format("noop").mode("overwrite").save())
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-32s ${ts.sorted.apply(1)}%8.1f ms")
    }

    val li = core.Tables.load(spark, sfDir, "lineitem")
    val filtered = li
      .filter(regexp_like(concat(col("l_returnflag"), col("l_linestatus")), lit("[AN]F")))
      .select(col("l_orderkey"), col("l_extendedprice"))

    time("scan+regex, no sort")(filtered)
    time("scan+regex, orderBy")(filtered.orderBy(col("l_orderkey"), col("l_extendedprice")))
    time("scan+regex, sort 1 part")(
      filtered.repartition(1).sortWithinPartitions(col("l_orderkey"), col("l_extendedprice")))
    time("bare scan 1 col")(li.select(col("l_orderkey")))
    // Hash-shuffle barrier before the range sort: AQE materializes the
    // shuffle stage, so the range-boundary sample pass reads the (small)
    // shuffle output instead of re-running the scan+filter.
    time("scan+regex, repart+orderBy")(
      filtered.repartition(col("l_orderkey"))
        .orderBy(col("l_orderkey"), col("l_extendedprice")))
    // Highly selective output (≈100 rows) — the class most bench scalar
    // queries fall into.
    val tiny = li.filter(col("l_orderkey") % 6001 === 0)
      .select(col("l_orderkey"), col("l_extendedprice"))
    time("tiny out, orderBy")(tiny.orderBy(col("l_orderkey"), col("l_extendedprice")))
    time("tiny out, repart+orderBy")(
      tiny.repartition(col("l_orderkey")).orderBy(col("l_orderkey"), col("l_extendedprice")))
    spark.stop()
  }
}

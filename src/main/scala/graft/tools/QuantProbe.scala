package graft.tools

import graft.core

/** Perf probe: q51's exact-quantile operator across bucketBits settings.
  * The tradeoff being measured: wider buckets (fewer bits) shrink the
  * bucket-count relation and the partial-agg hash tables of pass 1, but
  * let more rows survive into pass 2's selection. Not part of the bench
  * protocol. Usage: QuantProbe [sfDir] [bitsCsv] */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/sf1")
    val bits = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(20, 16, 12, 10, 8))
    val spark = core.Sessions.local(appName = "graft-quantprobe")
    val li = core.Tables.load(spark, sf, "lineitem")
    val specs = Seq(
      ("l_quantity", 0.25, "p25"), ("l_quantity", 0.5, "p50"),
      ("l_quantity", 0.9, "p90"), ("l_extendedprice", 0.5, "med_price"))
    bits.foreach { b =>
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.ext.Quantiles.exactQuantiles(li, "l_returnflag", specs, b)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run() // warm
      val t = Seq.fill(3)(run()).sorted.apply(1)
      println(f"[quantprobe] bits=$b%2d median=$t%.3f s")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core

/** Round-12 q51 adjudication probe: the r11 pair moved q51 5.18 → 6.84 s
  * at sf10 while DuckDB's identical SQL improved 5.95 → 4.40 s on a VM
  * that is otherwise ~13% slower. The engine side is git-unchanged since
  * r10, so this measures (a) whether 6.8 s reproduces cleanly hot, (b)
  * where it goes — full operator vs the pass-1 bucket histogram alone
  * (pass 2 ≈ the difference), and (c) bucketBits sensitivity (a larger
  * histogram shrinks the pass-2 candidate span; a smaller one shrinks the
  * pass-1 hash map). */
object Q51Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val spark = core.Sessions.local(appName = "graft-q51probe2")
    val li = core.Tables.load(spark, sfDir, "lineitem")
    val specs = Seq(
      ("l_quantity", 0.25, "p25"), ("l_quantity", 0.5, "p50"),
      ("l_quantity", 0.9, "p90"), ("l_extendedprice", 0.5, "med_price"))

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q51probe2] $label%-28s median ${ts.sorted.apply(1)}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    // pass-1 shape alone: melt + bucket histogram (the one corpus shuffle)
    import graft.functions.ColumnOps.doubleSortBits
    def pass1(bits: Int): Unit = li.select(col("l_returnflag").as("__g"),
        posexplode(array(col("l_quantity").cast("double"),
          col("l_extendedprice").cast("double"))))
      .toDF("__g", "__t", "__v")
      .select(col("__g"), col("__t"),
        shiftright(doubleSortBits(col("__v")), 64 - bits).as("__b"))
      .groupBy("__g", "__t", "__b").count()
      .write.format("noop").mode("overwrite").save()

    def full(bits: Int): Unit = graft.ext.Quantiles.exactQuantiles(
        li, "l_returnflag", specs, bucketBits = bits)
      .write.format("noop").mode("overwrite").save()

    time("pass1 hist bits=14")(pass1(14))
    time("full bits=14 (q51 as-is)")(full(14))
    time("full bits=10")(full(10))
    time("full bits=18")(full(18))
    spark.stop()
  }
}

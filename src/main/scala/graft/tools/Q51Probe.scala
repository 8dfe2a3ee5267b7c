package graft.tools

import org.apache.spark.sql.functions._
import graft.core
import graft.functions.ColumnOps.doubleSortBits

/** Decompose q51's selection-pass cost: melt alone, melt+join(eq),
  * melt+join(null-safe), and the agg variants. */
object Q51Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = core.Sessions.local(appName = "graft-q51probe")
    val li = core.Tables.load(spark, sfDir, "lineitem")
    val valueCols = Seq("l_quantity", "l_extendedprice")
    def melt = li.select(col("l_returnflag").as("__g"),
        posexplode(array(valueCols.map(c => col(c).cast("double")): _*)))
      .toDF("__g", "__t", "__v")
      .filter(col("__v").isNotNull)
      .select(col("__g"), col("__t"), col("__v"),
        shiftright(doubleSortBits(col("__v")), 44).as("__b"))
    import spark.implicits._
    val needed = Seq(("A", 0, 100L, 0L, 100L), ("N", 1, 200L, 0L, 100L),
      ("R", 0, 300L, 0L, 100L)).toDF("__g", "__t", "__b", "__off", "__n")

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[q51probe] $label%-32s ${(System.nanoTime()-t0)/1e6}%6.0f ms")
    }
    time("melt+count")(melt.groupBy("__g","__t","__b").count())
    time("melt+join-eq")(melt.as("s").join(broadcast(needed.as("n")),
      $"s.__g" === $"n.__g" && $"s.__t" === $"n.__t" && $"s.__b" === $"n.__b"))
    time("melt+join-nullsafe")(melt.as("s").join(broadcast(needed.as("n")),
      $"s.__g" <=> $"n.__g" && $"s.__t" === $"n.__t" && $"s.__b" === $"n.__b"))
    time("melt+join-eq+agg")(melt.as("s").join(broadcast(needed.as("n")),
      $"s.__g" === $"n.__g" && $"s.__t" === $"n.__t" && $"s.__b" === $"n.__b")
      .groupBy($"s.__g", $"s.__t", $"s.__v", $"n.__n", $"s.__b", $"n.__off")
      .agg(count(lit(1))))
    val meltP = melt.withColumn("__k", xxhash64($"__g", $"__t", $"__b"))
    val neededP = needed.withColumn("__k", xxhash64($"__g", $"__t", $"__b"))
    time("melt+join-packedlong")(meltP.as("s").join(broadcast(neededP.as("n")),
      $"s.__k" === $"n.__k" && $"s.__g" <=> $"n.__g" && $"s.__t" === $"n.__t" && $"s.__b" === $"n.__b"))
    val pre = $"__t" === 0 && $"__b".between(90L, 310L) || $"__t" === 1 && $"__b".between(150L, 250L)
    time("melt+prefilter+join")(melt.filter(pre).as("s").join(broadcast(needed.as("n")),
      $"s.__g" === $"n.__g" && $"s.__t" === $"n.__t" && $"s.__b" === $"n.__b"))
    time("melt+join-packed+agg")(meltP.as("s").join(broadcast(neededP.as("n")),
      $"s.__k" === $"n.__k" && $"s.__g" <=> $"n.__g" && $"s.__t" === $"n.__t" && $"s.__b" === $"n.__b")
      .groupBy($"s.__g", $"s.__t", $"s.__v", $"n.__n", $"s.__b", $"n.__off")
      .agg(count(lit(1))))
    spark.stop()
  }
}

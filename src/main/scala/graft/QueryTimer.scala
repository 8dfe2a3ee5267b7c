package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries. Usage:
  * `runMain graft.QueryTimer <sfDir> [names...]` (no names = all). */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = core.Sessions.local("8", appName = "graft-timer")
    val reps = sys.env.getOrElse("QT_REPS", "1").toInt
    val noop = sys.env.get("QT_MODE").contains("noop")
    names.foreach { n =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val cnt = try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          if (noop) { df.write.format("noop").mode("overwrite").save(); "-" }
          else df.count().toString
        } catch { case e: Throwable => s"ERR ${e.getMessage.take(80)}" }
        println(f"TIMER $n%-28s run$r ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$cnt")
        Console.flush()
      }
    }
    spark.stop()
  }
}

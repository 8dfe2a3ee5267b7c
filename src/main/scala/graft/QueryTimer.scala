package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries. Usage:
  * `runMain graft.QueryTimer <sfDir> [names...]` (no names = all). */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = try SparkEntry.queries(n)(spark, sfDir).count().toString
        catch { case e: Throwable => s"ERR ${e.getMessage.take(80)}" }
      println(f"TIMER $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$cnt")
      Console.flush()
    }
    spark.stop()
  }
}

package graft.tools

import graft.{SparkEntry, core}

/** Print the formatted physical plan for one named query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = core.Sessions.local(appName = "graft-explain")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}

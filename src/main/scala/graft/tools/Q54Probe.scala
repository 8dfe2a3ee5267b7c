package graft.tools
import graft.SparkEntry
/** Round-11 probe: where does q54 (correlated EXISTS + NOT EXISTS) spend
  * its 2.4 s at sf10, and does any alternative shape beat the planner's
  * two semi/anti joins? */
object Q54Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(appName = "q54-probe")
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    def time(tag: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-22s ${ts.sorted.apply(1)}%6.2fs")
    }
    time("q54_as_is") {
      SparkEntry.queries("q54_exists_subquery")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    println(SparkEntry.queries("q54_exists_subquery")(spark, dir)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort "))
      .mkString("\n"))
    spark.stop()
  }
}

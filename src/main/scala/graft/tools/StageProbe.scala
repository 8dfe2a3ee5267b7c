package graft.tools

import graft.{SparkEntry, core}

/** Perf diagnostic: per-stage wall time and task counts for one query.
  * Usage: StageProbe <queryName> [sfDir] */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/tmp/sf1"
    val spark = core.Sessions.local(appName = "graft-stageprobe")
    // warm
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        stages.add((i.stageId, ms, i.numTasks, i.name.takeWhile(_ != '\n').take(80)))
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e6
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    val all = stages.asScala.toSeq.sortBy(_._1)
    all.foreach { case (id, ms, n, nm) => println(f"[stage] $id%3d ${ms}%6d ms tasks=$n%3d $nm") }
    println(f"[stage] TOTAL wall=${total}%.0f ms stageSum=${all.map(_._2).sum} ms stages=${all.size}")
    spark.stop()
  }
}

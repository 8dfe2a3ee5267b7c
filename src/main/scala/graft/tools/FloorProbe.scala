package graft.tools

import graft.{SparkEntry, core}

/** Perf diagnostic: splits the per-query wall time into Catalyst
  * planning (analysis + optimization + physical planning, forced via
  * `executedPlan`) and execution (noop write). Run on a small SF to see
  * what the fixed per-query floor is made of; not part of the bench
  * protocol.
  *
  * Usage: FloorProbe [sfDir] [q1,q2,...]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = core.Sessions.local(appName = "graft-floorprobe")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q33_regex", "q41_date_offsets", "q48_string_fns2", "q34_null_fns", "q16_case_label")

    names.foreach { n =>
      // warm-up twice (codegen + JIT), then measure
      (1 to 2).foreach { _ =>
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      jobs.set(0); stages.set(0); tasks.set(0)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+optimize+physical plan
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
      }
      val plan = times.map(_._1).sorted.apply(1)
      val exec = times.map(_._2).sorted.apply(1)
      Thread.sleep(100) // let listener drain
      println(f"$n%-24s plan=${plan}%8.1f ms  exec=${exec}%8.1f ms  " +
        f"jobs/run=${jobs.get / 3.0}%4.1f stages=${stages.get / 3.0}%4.1f tasks=${tasks.get / 3.0}%5.1f")
    }
    spark.stop()
  }
}

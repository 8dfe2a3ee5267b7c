package graft.core

import org.apache.spark.sql.SparkSession

/** One place for engine session tuning (all mains + tests go through here).
  *
  * - shuffle.partitions = 32: the local-mode contract (matches cores; at
  *   cluster scale this becomes executors × cores and AQE re-plans anyway).
  * - AQE on with size-based coalescing (`parallelismFirst=false`): post-
  *   shuffle partitions target `advisoryPartitionSizeInBytes` instead of
  *   being pinned to the static number — tiny stages collapse to 1-2 tasks
  *   (latency win at bench scale), huge stages still fan out (the 100 TB
  *   story is unchanged: AQE adapts by data size, not a constant).
  */
object Sessions {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName: String = "graft"): SparkSession = {
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "on") != "off"
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      // FAIR so concurrent driver threads (JobRunner.runAllParallel) share
      // executors instead of queueing whole jobs FIFO; no effect on
      // single-job runs
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

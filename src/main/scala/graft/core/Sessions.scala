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
  * - advisory size 8 MB, not the 64 MB default: post-shuffle bytes are
  *   compressed, so a 64 MB target collapses a multi-million-row sort onto
  *   1-2 tasks and serializes it while the other cores idle (measured 4-6x
  *   on window/sort-heavy queries at 10x scale). 8 MB keeps those stages
  *   ~15-30 way parallel while sub-8 MB stages still coalesce to one task.
  *   On a real cluster the same advisory holds: it bounds per-task sort
  *   memory, and stage width follows data size.
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
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core

/** Round-13 diagnostic: where do the ~3-5 s/round of the distributed
  * component loop go at the 100× set? Materializes the real x0_linkage
  * edge set once, then runs Dedup.connectedComponents under a
  * stage-duration listener. Partition count / AQE variants via env.
  *
  * Usage: Cc2Probe [sfDir] */
object Cc2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val spark = core.Sessions.local(appName = "graft-cc2probe")
    import graft.functions.ColumnOps.jaroWinklerSim

    val cust = core.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val planted = cust.unionByName(
      cust.filter(col("c_custkey") < 30)
        .select((col("c_custkey") + 1000000000000L).as("c_custkey"),
          concat(lit(" "), upper(col("c_name")), lit(" ")).as("c_name"),
          col("c_nationkey")))
    val norm = planted.withColumn("nm", lower(trim(col("c_name"))))
    val edges = graft.ext.Blocking
      .sortedNeighborhood(norm, "c_custkey", blockKeys = Seq("c_nationkey"),
        sortKeys = Seq("nm"), window = 1, carry = Seq("nm"))
      .filter(jaroWinklerSim(col("nm_a"), col("nm_b")) >= 0.99)
      .select(col("c_custkey_a").as("id_a"), col("c_custkey_b").as("id_b"))
      .localCheckpoint(true)
    println(s"[cc2] edges=${edges.count()}")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        stages.add((i.stageId, ms, i.numTasks, i.name.takeWhile(_ != '\n').take(60)))
      }
    })
    // both regimes: the driver union-find fast path (default limit) and
    // the forced distributed propagation loop (limit 0)
    for (trial <- 1 to 3; forced <- Seq(false, true)) {
      stages.clear()
      val t0 = System.nanoTime()
      val cc = graft.ext.Dedup.connectedComponents(edges,
        driverEdgeLimit = if (forced) 0L else 16000000L)
      val n = cc.count()
      print(s"[cc2] path=${if (forced) "distributed" else "driver-uf"} ")
      import scala.jdk.CollectionConverters._
      val all = stages.asScala.toSeq.sortBy(_._1)
      println(f"[cc2] trial=$trial labels=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"stageSum=${all.map(_._2).sum} ms stages=${all.size}")
      if (sys.env.contains("GRAFT_CC_STAGES"))
        all.foreach { case (id, ms, nt, nm) =>
          println(f"[cc2stage] $id%4d ${ms}%6d ms tasks=$nt%3d $nm")
        }
    }
    spark.stop()
  }
}

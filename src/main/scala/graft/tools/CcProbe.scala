package graft.tools

import org.apache.spark.sql.functions._

import graft.core

/** Round-12 diagnostic: per-round change counts of the pointer-jumping
  * component loop on (a) a synthetic many-chains graph shaped like
  * x0_linkage's sf10 edge set and (b) the real x0_linkage edge set. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(appName = "graft-ccprobe")
    import spark.implicits._

    def trace(pairs: org.apache.spark.sql.DataFrame, maxIter: Int): Unit = {
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct().cache()
      var labels = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
        .withColumn("cluster", col("id")).localCheckpoint(true)
      var i = 0
      var converged = false
      while (!converged && i < maxIter) {
        val neighborMin = edges
          .join(labels.select(col("id").as("dst"), col("cluster").as("nc")), "dst")
          .groupBy(col("src").as("id")).agg(min(col("nc")).as("nmin"))
        val hop = labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        val next = hop.select(col("id"), col("cluster").as("mid"))
          .join(hop.select(col("id").as("mid"), col("cluster").as("root")),
            Seq("mid"), "left")
          .select(col("id"), coalesce(col("root"), col("mid")).as("cluster"))
          .localCheckpoint(true)
        val diff = next.join(labels.withColumnRenamed("cluster", "old"), "id")
          .filter(col("cluster") =!= col("old"))
        val changed = diff.count()
        if (changed > 0 && changed < 200)
          diff.orderBy(col("id")).limit(6).collect().foreach(r =>
            println(s"[ccprobe]   id=${r.get(0)} new=${r.get(1)} old=${r.get(2)}"))
        labels.unpersist(false)
        labels = next
        converged = changed == 0
        i += 1
        println(s"[ccprobe] round $i changed=$changed")
      }
      edges.unpersist()
      println(s"[ccprobe] converged=$converged rounds=$i")
    }

    // (a) synthetic: 1000 chains x 100 nodes
    val chains = spark.range(1000).flatMap { g =>
      (0L until 99L).map(i => (g * 1000 + i, g * 1000 + i + 1))
    }.toDF("id_a", "id_b")
    println("[ccprobe] === synthetic 1000 x 100-chains ===")
    trace(chains, 12)

    // (b) the real x0_linkage edge set at args(0)
    args.headOption.foreach { dir =>
      import graft.functions.ColumnOps.jaroWinklerSim
      import org.apache.spark.sql.expressions.Window
      val cust = core.Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val planted = cust.unionByName(
        cust.filter(col("c_custkey") < 30)
          .select((col("c_custkey") + 1000000000000L).as("c_custkey"),
            concat(lit(" "), upper(col("c_name")), lit(" ")).as("c_name"),
            col("c_nationkey")))
      val norm = planted.withColumn("nm", lower(trim(col("c_name"))))
      val wNbr = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("nm"), col("c_custkey"))
      val edges = norm
        .withColumn("nm_next", lead(col("nm"), 1).over(wNbr))
        .withColumn("id_next", lead(col("c_custkey"), 1).over(wNbr))
        .filter(col("nm_next").isNotNull &&
          jaroWinklerSim(col("nm"), col("nm_next")) >= 0.99)
        .select(col("c_custkey").as("id_a"), col("id_next").as("id_b"))
        .localCheckpoint(true)
      println(s"[ccprobe] === real x0_linkage edges at $dir: ${edges.count()} ===")
      // longest chain = largest component size upper bound via name groups
      println("[ccprobe] max same-name group size: " +
        norm.groupBy(col("c_nationkey"), col("nm")).count()
          .agg(max(col("count"))).head().getLong(0))
      trace(edges, 12)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Perf probe for q68's plan shapes at a given SF dir: current composition,
  * forced-broadcast delta keys in the upsert, and persisted base.
  * `runMain graft.tools.Q68Probe [sfDir] [reps]` */
object Q68Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.core.Sessions.local(appName = "graft-q68probe")

    def orders(): DataFrame = graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))

    def delta(o: DataFrame): DataFrame = {
      val updates = o.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val inserts = o.filter(col("o_orderkey") % 100 === 7)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("o_orderstatus", lit("N"))
      updates.unionByName(inserts)
    }

    def time(name: String)(body: => Long): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = body
      println(f"Q68 $name%-22s run$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      Console.flush()
    }

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    time("current") {
      val o = orders()
      noop(graft.etl.SnapshotDiff.diff(
        o, graft.etl.Upsert.upsert(o, delta(o), Seq("o_orderkey")),
        Seq("o_orderkey"), exact = true).orderBy(col("o_orderkey")))
    }

    time("bcast-delta-keys") {
      val o = orders()
      val d = delta(o)
      val after = o.join(
          broadcast(d.select(col("o_orderkey")).distinct()),
          Seq("o_orderkey"), "left_anti")
        .unionByName(d)
      noop(graft.etl.SnapshotDiff.diff(o, after, Seq("o_orderkey"),
        exact = true).orderBy(col("o_orderkey")))
    }

    time("persisted-base") {
      val o = orders().persist(StorageLevel.MEMORY_AND_DISK)
      try {
        o.count()
        noop(graft.etl.SnapshotDiff.diff(
          o, graft.etl.Upsert.upsert(o, delta(o), Seq("o_orderkey")),
          Seq("o_orderkey"), exact = true).orderBy(col("o_orderkey")))
      } finally o.unpersist(false)
    }

    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rebuild the 10x stress set (sf1) from sf0.1 — the same construction the
  * round-2 protocol used (replicate each table N times, shifting the
  * primary key by `replica * (max(key)+1)` so keys stay unique and
  * equi-joins keep working per replica). Used for the per-round sf1 bench
  * artifact (`BENCH_r*_sf1.json`) and the 10x verify stress pass.
  *
  * Usage: ScaleUp [srcDir] [dstDir] [factor]
  *   defaults: /root/testdata/sf0.1 /tmp/sf1 10
  */
object ScaleUp {

  /** table → primary-key column to shift (dimension tables region/nation
    * replicate as-is: they are genuinely fixed-cardinality). */
  val keyedTables: Seq[(String, String)] = Seq(
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
    "customer" -> "c_custkey", "part" -> "p_partkey",
    "supplier" -> "s_suppkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.Sessions.local(appName = "graft-scaleup")

    for (t <- Seq("region", "nation")) {
      graft.core.Tables.loadUncached(spark, src, t)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t copied")
    }
    for ((t, key) <- keyedTables) {
      val base = graft.core.Tables.loadUncached(spark, src, t)
      val off = base.agg(max(col(key)).cast("long")).collect()(0).getLong(0) + 1L
      val scaled = (0 until factor)
        .map(i => base.withColumn(key, col(key) + lit(i * off)))
        .reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x$factor rows=" +
        spark.read.parquet(s"$dst/$t.parquet").count())
    }
    spark.stop()
  }
}

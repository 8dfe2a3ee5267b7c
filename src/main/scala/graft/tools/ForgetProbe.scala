package graft.tools

import org.apache.spark.sql.functions._

/** X92 scale probe: surgical [[graft.etl.Forget.deleteKeys]] vs the naive
  * filter-everything-rewrite on a lang-partitioned copy of documents at a
  * given SF dir. The delete set is en-only keys, so the surgical path
  * rewrites ONE partition of five. Results journaled in SURVEY §6.9. */
object ForgetProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = graft.core.Sessions.local(appName = "forget-probe")
    val root = java.nio.file.Files.createTempDirectory("graft_forget_probe").toString
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val n = docs.count()
    val keys = docs.filter(col("doc_id") % 37 === 0 && col("lang") === "en")
      .select(col("doc_id"))

    // surgical path
    docs.write.partitionBy("lang").parquet(s"$root/a")
    val (report, surgical) = time {
      graft.etl.Forget.deleteKeys(spark, s"$root/a", "lang", "doc_id", keys)
    }
    println(f"corpus rows: $n; deleted ${report.deletedTotal} from " +
      f"${report.partitions.size} of 5 partitions")
    println(f"surgical deleteKeys:           $surgical%.2f s")

    // naive path: global anti-join + full overwrite (staged like Forget)
    docs.write.partitionBy("lang").parquet(s"$root/b")
    val (_, naive) = time {
      spark.read.parquet(s"$root/b")
        .join(broadcast(keys.withColumnRenamed("doc_id", "k")),
          col("doc_id") === col("k"), "left_anti")
        .write.partitionBy("lang").parquet(s"$root/b_new")
    }
    println(f"naive full rewrite:            $naive%.2f s  (${naive / surgical}%.1fx)")

    // realistic lifecycle shape: 50 partitions, hits confined to one
    val sharded = docs.withColumn("shard", (col("doc_id") % 50).cast("int"))
    val keys1 = sharded.filter(col("shard") === 7 && col("doc_id") % 37 === 0)
      .select(col("doc_id"))
    sharded.write.partitionBy("shard").parquet(s"$root/c")
    val (r2, surgical2) = time {
      graft.etl.Forget.deleteKeys(spark, s"$root/c", "shard", "doc_id", keys1)
    }
    println(f"50-shard surgical (1 hit shard): $surgical2%.2f s " +
      f"(deleted ${r2.deletedTotal})")
    sharded.write.partitionBy("shard").parquet(s"$root/d")
    val (_, naive2) = time {
      spark.read.parquet(s"$root/d")
        .join(broadcast(keys1.withColumnRenamed("doc_id", "k")),
          col("doc_id") === col("k"), "left_anti")
        .write.partitionBy("shard").parquet(s"$root/d_new")
    }
    println(f"50-shard naive full rewrite:     $naive2%.2f s (${naive2 / surgical2}%.1fx)")

    // the quantity that actually scales: ROWS rewritten by each path
    // (bytes are confounded locally by file-count/dictionary effects)
    val surgicalRows = spark.read.parquet(s"$root/c/shard=7").count()
    val naiveRows = spark.read.parquet(s"$root/d_new").count()
    println(f"rows rewritten  surgical: $surgicalRows%d   naive: $naiveRows%d" +
      f"   (${naiveRows.toDouble / surgicalRows}%.0fx write volume)")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}

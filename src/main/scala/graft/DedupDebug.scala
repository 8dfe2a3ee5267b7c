package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Dedup

object DedupDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.ExtQueries.withPlantedDups(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"))
    val p = Dedup.MinHashParams()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2fs n=$n")
      Console.flush()
    }

    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), p.shingleSize).as("sh"))
    time("shingles")(sh.count())
    val sig = sh.select(col("id"), Dedup.minhashSignature(col("sh"), p.numPerm).as("sig"))
    time("signature-staged")(sig.count())
    val sigInline = docs.select(col("doc_id").as("id"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), p.shingleSize), p.numPerm).as("sig"))
    time("signature-inline")(sigInline.count())
    val bk = sig.select(col("id"), Dedup.bandKeys(col("sig"), p).as("bk"))
    time("bandkeys-staged")(bk.count())
    val exploded = bk.select(col("id"), posexplode(col("bk")).as(Seq("band", "key")))
    time("exploded")(exploded.count())
    val cached = exploded.cache()
    time("explode-cache")(cached.count())
    val a = cached.as("a"); val b = cached.as("b")
    val pairs = a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
      && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("pairs")(pairs.count())
    spark.stop()
  }
}

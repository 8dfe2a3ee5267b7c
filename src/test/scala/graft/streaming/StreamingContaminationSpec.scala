package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[StreamingContamination]] — the ingest-time decontamination gate.
  * Pinned: the row-local Bloom screen agrees with the exact batch screen
  * ([[graft.ext.Contamination.report]]) at default sizing, and the
  * streaming face emits exactly the batch result (stateless projection —
  * micro-batch boundaries cannot matter). */
class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs"))
    .toDF("doc_id", "text")

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"), // heavy hit
    (2L, "pack my box with entirely unrelated words here now"), // partial
    (3L, "completely clean document with original content words"), // clean
    (4L, "too short")) // < n tokens: no grams, never flagged
    .toDF("doc_id", "text")

  private lazy val bloom =
    StreamingContamination.fit(bench, "doc_id", "text", n = 3)

  test("screen agrees with the exact batch report; short docs never flagged") {
    val got = StreamingContamination
      .screen(docs, bloom, "text", maxRatio = 0.5)
      .select("doc_id", "n_grams", "n_hit", "ratio", "contaminated")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    val exact = graft.ext.Contamination
      .report(docs, bench, "doc_id", "text", n = 3)
      .select(col("doc_id"), col("n_grams"), col("n_hit"), col("ratio"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // gram-bearing docs: bloom screen == exact screen (no false positive
    // fired at this sizing; false negatives are impossible by contract)
    got.filter(_._2 > 0).foreach { case (id, ng, nh, ratio, _) =>
      val (_, eng, enh, eratio) = exact(id)
      assert((ng, nh, ratio) === ((eng, enh, eratio)), s"doc $id")
    }
    // doc 1 is contaminated at 0.5; doc 3 clean; doc 4 gram-less
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._5 === true)
    assert(byId(3L)._3 === 0L && byId(3L)._5 === false)
    assert(byId(4L)._2 === 0L && byId(4L)._4 === 0.0 && byId(4L)._5 === false)
    // the batch report has no row for gram-less docs; the screen keeps it
    assert(!exact.contains(4L))
  }

  test("streaming face emits exactly the batch screen result") {
    val root = Files.createTempDirectory("graft_contam").toString
    docs.repartition(2).write.parquet(s"$root/src")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
    val q = StreamingContamination
      .screen(stream, bloom, "text", maxRatio = 0.5)
      .writeStream.format("memory").queryName("contam_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("contam_out")
      .select("doc_id", "n_grams", "n_hit", "ratio", "contaminated")
      .orderBy("doc_id").collect().toSeq
    val batch = StreamingContamination
      .screen(docs, bloom, "text", maxRatio = 0.5)
      .select("doc_id", "n_grams", "n_hit", "ratio", "contaminated")
      .orderBy("doc_id").collect().toSeq
    assert(streamed === batch)
  }
}

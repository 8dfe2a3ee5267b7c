package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.AnnIndex

/** [[StreamingAnnIndex]]: micro-batch maintenance of an X94 index. Pins
  * (1) the streamed index ≡ a one-shot build over everything that has
  * streamed (under the same frozen models), (2) replay idempotence
  * through processBatch, (3) the MemoryStream wrapper end to end with
  * folded vectors immediately searchable (top-1 = self). */
class StreamingAnnIndexSpec extends SparkSpec {
  import spark.implicits._
  private implicit val s: SparkSession = spark

  private lazy val emb =
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val corpus = emb.filter($"vec_id" >= 20)
  private lazy val b0 = emb.filter($"vec_id" < 10)
  private lazy val b1 = emb.filter($"vec_id" >= 10 && $"vec_id" < 20)

  test("streamed folds equal a one-shot build; replay is idempotent") {
    val root = Files.createTempDirectory("graft_sann").toString
    val coarse = graft.ext.Ivf.train(emb, k = 8, iters = 2)
    val idx = AnnIndex.createWithModels(corpus, s"$root/idx", coarse, None)
    StreamingAnnIndex.processBatch(b0.toDF(), 0L, s"$root/idx")
    StreamingAnnIndex.processBatch(b1.toDF(), 1L, s"$root/idx")
    val all = AnnIndex.createWithModels(emb, s"$root/all", coarse, None)
    def rows(i: AnnIndex.Index): Seq[String] =
      AnnIndex.lists(i).drop("batch_id").collect().map(_.toString).sorted.toSeq
    assert(rows(idx) === rows(all))
    // replay batch 1 (at-least-once): index content unchanged
    val before = AnnIndex.lists(idx).collect().map(_.toString).sorted.toSeq
    StreamingAnnIndex.processBatch(b1.toDF(), 1L, s"$root/idx")
    assert(AnnIndex.lists(idx).collect().map(_.toString).sorted.toSeq === before)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("MemoryStream end-to-end: folded vectors immediately searchable") {
    val root = Files.createTempDirectory("graft_sann2").toString
    AnnIndex.create(corpus, s"$root/idx", k = 8, iters = 2)
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val q = StreamingAnnIndex.start(
      mem.toDF().toDF("vec_id", "embedding"), s"$root/idx", s"$root/ckpt")
    try {
      mem.addData(b0.select($"vec_id", $"embedding")
        .as[(Long, Array[Float])].collect().toSeq: _*)
      q.processAllAvailable()
      mem.addData(b1.select($"vec_id", $"embedding")
        .as[(Long, Array[Float])].collect().toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val queries = b1.select($"vec_id".as("query_id"), $"embedding")
    val top1 = AnnIndex.topK(AnnIndex.open(s"$root/idx"), queries,
        k = 1, nprobe = 3)
      .select($"query_id", $"id").collect()
    assert(top1.length === 10)
    top1.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("attrCols survive streaming folds: filtered search over an index " +
      "maintained through processBatch equals the one-shot sibling") {
    val root = Files.createTempDirectory("graft_sann3").toString
    val attrEmb = emb.withColumn("grp", $"vec_id" % 10)
    val coarse = graft.ext.Ivf.train(attrEmb, k = 8, iters = 2)
    val idx = AnnIndex.createWithModels(
      attrEmb.filter($"vec_id" >= 20), s"$root/idx", coarse, None,
      attrCols = Seq("grp"))
    assert(idx.attrCols === Seq("grp"))
    // the streaming face opens the index fresh each micro-batch — the
    // persisted manifest, not the caller, must supply the attr columns
    StreamingAnnIndex.processBatch(
      attrEmb.filter($"vec_id" < 10).toDF(), 0L, s"$root/idx")
    StreamingAnnIndex.processBatch(
      attrEmb.filter($"vec_id" >= 10 && $"vec_id" < 20).toDF(), 1L,
      s"$root/idx")
    val oneShot = AnnIndex.createWithModels(attrEmb, s"$root/all", coarse,
      None, attrCols = Seq("grp"))
    val pred = col("grp") === 3
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def key(i: AnnIndex.Index) =
      AnnIndex.topKFiltered(i, queries, pred, k = 3, nprobe0 = 8)
        .select($"query_id", $"id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val streamed = key(AnnIndex.open(s"$root/idx"))
    assert(streamed.nonEmpty)
    assert(streamed === key(oneShot))
    // streamed rows themselves are filtered-searchable (vec_id 3 is in
    // batch 0, grp 3): its own query must find it at rank 1
    val self = AnnIndex.topKFiltered(AnnIndex.open(s"$root/idx"),
        emb.filter($"vec_id" === 3).select($"vec_id".as("query_id"),
          $"embedding"), pred, k = 1, nprobe0 = 8)
      .select($"id").collect()
    assert(self.map(_.getLong(0)).toSeq === Seq(3L))
    // a batch missing the declared attr column fails fast, not NULL-later
    val thrown = intercept[IllegalArgumentException] {
      StreamingAnnIndex.processBatch(
        emb.filter($"vec_id" < 5).toDF(), 2L, s"$root/idx")
    }
    assert(thrown.getMessage.contains("grp"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}

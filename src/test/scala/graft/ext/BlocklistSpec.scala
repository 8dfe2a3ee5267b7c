package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Blocklist]] — C4-style phrase blocklist with token-boundary
  * matching. Oracle face: x74_blocklist. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the washcloth is clean"),          // substring trap: no hit
    (2L, "please wash the cloth"),           // token 'wash': hit
    (3L, "Bad Phrase here, bad phrase there"), // repeated phrase: counts ONCE
    (4L, "totally fine text"),
    (5L, "a bad phrase and wash day"),       // two distinct entries
    (6L, ""))                                // empty doc: 0 hits, kept
    .toDF("doc_id", "text")

  private val list = Seq("wash", "Bad-Phrase")

  test("token boundaries: 'washcloth' never trips 'wash'") {
    val got = Blocklist.screen(docs, "text", list)
      .select("doc_id", "n_blocked").as[(Long, Long)].collect().toMap
    assert(got(1L) === 0L)
    assert(got(2L) === 1L)
  }

  test("distinct-phrase counting and normalization of the list side") {
    val got = Blocklist.screen(docs, "text", list)
      .select("doc_id", "n_blocked", "blocked")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // 'Bad-Phrase' normalizes to the bigram 'bad phrase'; repeats count once
    assert(got(3L) === ((1L, true)))
    assert(got(5L) === ((2L, true)))
    assert(got(4L) === ((0L, false)))
    assert(got(6L) === ((0L, false)))
  }

  test("filterBlocked removes exactly the flagged docs, schema untouched") {
    val kept = Blocklist.filterBlocked(docs, "text", list)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSet === Set(1L, 4L, 6L))
  }

  test("punctuation-only phrases are rejected as an empty list") {
    intercept[IllegalArgumentException] {
      Blocklist.screen(docs, "text", Seq("!!!", "--"))
    }
  }

  test("streaming face emits exactly the batch screen (stateless gate at the door)") {
    // like StreamingContamination: a pure row-local projection runs
    // identically on every micro-batch — the blocklist gates at ingest
    val root = java.nio.file.Files.createTempDirectory("graft_blk").toString
    docs.repartition(2).write.parquet(s"$root/src")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
    val q = Blocklist.screen(stream, "text", list)
      .writeStream.format("memory").queryName("blk_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("blk_out")
      .select("doc_id", "n_blocked", "blocked").orderBy("doc_id").collect().toSeq
    val batch = Blocklist.screen(docs, "text", list)
      .select("doc_id", "n_blocked", "blocked").orderBy("doc_id").collect().toSeq
    assert(streamed === batch)
  }
}

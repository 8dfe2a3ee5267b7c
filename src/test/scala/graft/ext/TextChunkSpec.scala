package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunking covers every token with the requested overlap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = TextChunk.chunkTokens(df, "text", maxTokens = 32, overlap = 4)
      .orderBy("chunk_idx").collect()
    // stride 28 → starts 0,28,56,84 → 4 chunks
    assert(chunks.length === 4)
    assert(chunks.map(_.getAs[Int]("chunk_idx")).toSeq === Seq(0, 1, 2, 3))
    assert(chunks.take(3).forall(_.getAs[Long]("chunk_tokens") === 32L))
    assert(chunks.last.getAs[Long]("chunk_tokens") === 16L) // 100 - 84
    // overlap: chunk 1 starts 4 tokens before chunk 0's end
    val c0 = chunks(0).getAs[String]("chunk_text").split(" ")
    val c1 = chunks(1).getAs[String]("chunk_text").split(" ")
    assert(c0.takeRight(4).toSeq === c1.take(4).toSeq)
    // reconstruction: stripping overlaps regains the original sequence
    val rebuilt = chunks.zipWithIndex.flatMap { case (r, i) =>
      val toks = r.getAs[String]("chunk_text").split(" ").toSeq
      if (i == 0) toks else toks.drop(4)
    }
    assert(rebuilt.toSeq === text.split(" ").toSeq)
  }

  test("short and empty docs") {
    val df = Seq((1L, "only three tokens"), (2L, "")).toDF("doc_id", "text")
    val chunks = TextChunk.chunkTokens(df, "text", maxTokens = 32)
    val rows = chunks.collect()
    assert(rows.length === 1) // empty doc emits nothing
    assert(rows.head.getAs[String]("chunk_text") === "only three tokens")
  }

  test("weighted mix is deterministic and roughly proportional") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run() = Mixing.weightedUnion(Seq(
        "a" -> (docs, 0.5), "b" -> (docs, 0.1)), "doc_id")
      .groupBy("mix_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m1 = run(); val m2 = run()
    assert(m1 === m2) // deterministic
    assert(m1("a") > 200 && m1("a") < 300) // ~250 of 500
    assert(m1("b") > 20 && m1("b") < 80)   // ~50 of 500
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train is deterministic and learns frequency-ordered merges") {
    val m1 = Bpe.train(corpus, 10)
    val m2 = Bpe.train(corpus, 10)
    assert(m1 === m2)
    assert(m1.length === 10)
    // the classic first merge: ('e','s') with count 6+3=9 beats all
    assert(m1.head === ("e", "s"))
    assert(m1(1) === ("es", "t")) // 'est' count 9 next
  }

  test("train stops early when no pairs remain") {
    val m = Bpe.train(Map("ab" -> 1L), 100)
    assert(m === Seq(("a", "b")))
  }

  test("encodeWord merges by rank and reconstructs the word") {
    val merges = Bpe.train(corpus, 8)
    val ranks = merges.zipWithIndex.toMap
    for (w <- Seq("lowest", "newer", "wide", "low", "unseen")) {
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString === w, s"round-trip of $w")
    }
    // a fully-learned word collapses to few tokens
    assert(Bpe.encodeWord("newest", ranks).length <= 2)
  }

  test("more merges never increase the token count") {
    val texts = Seq("the newest widest lowline", "low lower lowest")
    for (t <- texts) {
      val counts = Seq(0, 2, 4, 8).map { n =>
        val ranks = Bpe.train(corpus, n).zipWithIndex.toMap
        Bpe.pretokens(t).map(w => Bpe.encodeWord(w, ranks).length).sum
      }
      assert(counts === counts.sorted.reverse, s"monotone for '$t': $counts")
    }
  }

  test("expression kernel equals the driver-side mirror (codegen path)") {
    val docs = Seq(
      (1L, "Newest lowlands, wider views: 42 peaks!"),
      (2L, "the un-tokenizable élève"),
      (3L, ""),
      (4L, "lowest newest widest")).toDF("id", "text")
    val merges = Bpe.train(corpus, 8)
    val ranks = merges.zipWithIndex.toMap
    val got = docs.select(col("id"), Bpe.tokenCount(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, t) =>
      val expect = Bpe.pretokens(t).map(w => Bpe.encodeWord(w, ranks).length).sum.toLong
      assert(got(id) === expect, s"doc $id")
    }
  }

  test("tokens expression round-trips text word-by-word") {
    val merges = Bpe.train(corpus, 8)
    val got = Seq((1L, "Lowest NEWEST rates"))
      .toDF("id", "text")
      .select(Bpe.tokens(col("text"), merges).as("t"))
      .as[Seq[String]].collect().head
    assert(got.mkString === "lowestnewestrates")
  }

  test("trainFromCorpus learns from the documents table and applies at scale") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.trainFromCorpus(docs, "text", numMerges = 50, maxWords = 500)
    assert(merges.length === 50)
    val stats = docs.select(
        Bpe.tokenCount(col("text"), merges).as("bpe"),
        TextStats.bpeTokenCount(col("text")).cast("long").as("pre"))
      .agg(sum(col("bpe")).as("bpe"), sum(col("pre")).as("pre"))
      .as[(Long, Long)].collect().head
    // merges only ever fuse characters WITHIN a pre-token: every word is
    // >= 1 bpe token, so bpe >= pre-token count, and 50 merges on a 500-
    // word vocab must still compress well below character count
    assert(stats._1 >= stats._2, "subword count at least pre-token count")
    assert(stats._1 < stats._2 * 6, "bpe count bounded")
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")

  test("ngramHashes: count, distinctness, and short-doc exclusion") {
    val docs = Seq(
      (1L, "a b c d e"),     // 3 trigrams
      (2L, "a b c a b c"),   // 4 positions, 3 DISTINCT ("a b c" repeats)
      (3L, "just two"),      // shorter than n -> no rows
      (4L, "Tok-ens; SPLIT/on 9non9alnum!!")) // normalization path
      .toDF("doc_id", "text")
    val grams = Contamination.ngramHashes(docs, "doc_id", "text", n = 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(grams(1L) === 3L)
    assert(grams(2L) === 3L)
    assert(!grams.contains(3L))
    // "tok ens split on 9non9alnum" -> 5 tokens -> 3 trigrams
    assert(grams(4L) === 3L)
  }

  test("tokenization is case-insensitive and punctuation-blind") {
    val a = Contamination.ngramHashes(
      Seq((1L, "Hello, World! Again")).toDF("doc_id", "text"), "doc_id", "text", 3)
    val b = Contamination.ngramHashes(
      Seq((2L, "hello world again")).toDF("doc_id", "text"), "doc_id", "text", 3)
    assert(a.select("gram").collect().toSet === b.select("gram").collect().toSet)
  }

  test("report: planted contamination is detected, clean docs score zero") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // exact copy: ratio 1
      (2L, "completely unrelated tokens about spark plans"), // clean: 0
      (3L, "preface words then the quick brown fox jumps away")) // partial
      .toDF("doc_id", "text")
    val r = Contamination.report(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    val byId = r.map(x => x._1 -> x).toMap
    assert(byId(1L)._2 === 7L && byId(1L)._3 === 7L && byId(1L)._4 === 1.0)
    assert(byId(2L)._3 === 0L && byId(2L)._4 === 0.0)
    // doc 3: trigrams of "preface words then the quick brown fox jumps away"
    // hits: "the quick brown", "quick brown fox", "brown fox jumps" = 3 of 7
    assert(byId(3L)._2 === 7L && byId(3L)._3 === 3L)
    assert(math.abs(byId(3L)._4 - 3.0 / 7.0) < 1e-3)
  }

  test("report is exact under duplicate grams within a document") {
    // "a b c" occurs twice in the corpus doc but must count ONCE (distinct)
    val corpus = Seq((1L, "a b c x a b c")).toDF("doc_id", "text")
    val b = Seq((9L, "a b c")).toDF("doc_id", "text")
    val r = Contamination.report(corpus, b, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().head
    // distinct trigrams: "a b c", "b c x", "c x a", "x a b" = 4; hit = 1
    assert(r._2 === 4L && r._3 === 1L)
  }
}

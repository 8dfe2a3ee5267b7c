package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Vocab]] — vocabulary build + OOV coverage report. Oracle face:
  * x76_oov. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "cat dog cat bird"),
    (2L, "en", "cat dog fish"),
    (3L, "fr", "chat chien CAT!"),   // case/punct fold into 'cat'
    (4L, "fr", ""))                  // zero tokens: no report row
    .toDF("doc_id", "lang", "text")

  test("build: top-k by count desc with token asc tie-break") {
    val v = Vocab.build(docs, "text", k = 3)
      .select("token", "token_count", "rank")
      .as[(String, Long, Int)].collect().toSeq
    // counts: cat 4, dog 2, then 1-ties (bird, chat, chien, fish) — the
    // tie resolves alphabetically: bird
    assert(v === Seq(("cat", 4L, 1), ("dog", 2L, 2), ("bird", 1L, 3)))
  }

  test("oovReport counts occurrences, not types; zero-token slices drop") {
    val v = Vocab.build(docs, "text", k = 3)
    val got = Vocab.oovReport(docs, "text", v, Seq("lang"))
      .select("lang", "n_tokens", "n_oov", "oov_rate")
      .as[(String, Long, Long, Double)].collect().toMap4
    // en: 7 tokens, oov = fish (1) -> 1/7
    assert(got("en") === ((7L, 1L, 0.1429)))
    // fr: 3 tokens (cat folds in), oov = chat + chien -> 2/3
    assert(got("fr") === ((3L, 2L, 0.6667)))
    assert(got.size === 2)
  }

  test("an external word list works as the vocabulary") {
    val external = Seq("cat", "dog", "fish", "bird").toDF("token")
    val got = Vocab.oovReport(docs, "text", external, Seq("lang"))
      .select("lang", "n_oov").as[(String, Long)].collect().toMap
    assert(got("en") === 0L)
    assert(got("fr") === 2L)
  }

  private implicit class M(rows: Array[(String, Long, Long, Double)]) {
    def toMap4: Map[String, (Long, Long, Double)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}

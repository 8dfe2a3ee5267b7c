package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[NgramLm]] — add-k bigram LM scoring against hand-computed
  * probabilities; the corpus-scale face is oracle-checked as
  * x43_ngram_lm. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // doc1 bigrams: (a,b),(b,a),(a,b)  doc2: (a,b),(b,c)  doc3: none
  private def docs = Seq(
    (1L, "A b a B!"), (2L, "a b c"), (3L, "solo")).toDF("doc_id", "text")

  test("bigrams are row-local lowercased alpha pairs") {
    val bg = docs.select(col("doc_id"),
      NgramLm.bigrams(col("text")).as("bg")).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getString(1))))
    assert(bg(0)._2 === Seq(("a", "b"), ("b", "a"), ("a", "b")))
    assert(bg(1)._2 === Seq(("a", "b"), ("b", "c")))
    assert(bg(2)._2 === Seq.empty)
  }

  test("selfScore matches hand-computed add-k arithmetic") {
    // counts: c(a,b)=3 c(b,a)=1 c(b,c)=1; contexts: c(a.)=3 c(b.)=2; V=2
    val pAB = (3 + 0.5) / (3 + 0.5 * 2)
    val pBA = (1 + 0.5) / (2 + 0.5 * 2)
    val pBC = (1 + 0.5) / (2 + 0.5 * 2)
    val out = NgramLm.selfScore(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // doc3 has no bigrams
    val nll1 = -(math.log(pAB) * 2 + math.log(pBA)) / 3
    val nll2 = -(math.log(pAB) + math.log(pBC)) / 2
    assert(math.abs(out(0).getDouble(1) - nll1) < 1e-4)
    assert(math.abs(out(1).getDouble(1) - nll2) < 1e-4)
    assert(out(0).getLong(2) === 3L && out(1).getLong(2) === 2L)
  }

  test("merge of batch fits ≡ whole-corpus fit (incremental contract)") {
    val all = Seq(
      (1L, "a b a b c"), (2L, "b c a"), (3L, "c c b a"), (4L, "a b"))
      .toDF("doc_id", "text")
    val whole = NgramLm.fit(all)
    val folded = NgramLm.merge(
      NgramLm.merge(
        NgramLm.fit(all.filter(col("doc_id") === 1)),
        NgramLm.fit(all.filter(col("doc_id") === 2))),
      NgramLm.fit(all.filter(col("doc_id") >= 3)))
    val probe = Seq((9L, "a b c a x b")).toDF("doc_id", "text")
    val a = NgramLm.score(probe, whole).collect().head
    val b = NgramLm.score(probe, folded).collect().head
    assert(a.getDouble(1) === b.getDouble(1) && a.getLong(2) === b.getLong(2))
    // and the merged count tables are literally equal, not just score-equal
    assert(whole.bigramCounts.orderBy("__w1", "__w2").collect().toSeq ===
      folded.bigramCounts.orderBy("__w1", "__w2").collect().toSeq)
    assert(whole.vocab.collect().head.getLong(0) ===
      folded.vocab.collect().head.getLong(0))
  }

  test("unseen bigrams fall back to the smoothed floor against a fitted model") {
    val model = NgramLm.fit(docs)
    // "c a": context c unseen (c1=0) -> p = k/(k*V) = 1/V = 0.5
    // "a c": context a seen (c1=3), bigram unseen -> p = 0.5/(3+1) = 0.125
    val out = NgramLm.score(Seq((9L, "a c a")).toDF("doc_id", "text"), model)
      .collect()
    val expected = -(math.log(0.125) + math.log(0.5)) / 2
    assert(out.length === 1)
    assert(math.abs(out(0).getDouble(1) - expected) < 1e-4)
  }
}

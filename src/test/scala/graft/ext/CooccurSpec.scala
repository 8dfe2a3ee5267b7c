package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Cooccur]] — skip-gram pair counting with known tiny corpora. */
class CooccurSpec extends SparkSpec {
  import spark.implicits._

  private def counts(docs: Seq[String], window: Int = 2,
      minTermCount: Long = 1L): Map[(String, String), (Long, Double)] =
    Cooccur.pairCounts(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      window = window, minTermCount = minTermCount)
      .as[(String, String, Long, Double)].collect()
      .map { case (a, b, n, w) => (a, b) -> (n, w) }.toMap

  test("window-2 pairs with distance weighting") {
    // positions: a(1) b(2) c(3) a(4)
    val got = counts(Seq("a b c a"))
    assert(got === Map(
      ("a", "b") -> (2L, 1.5), // (1,2) d1 + (2,4) d2
      ("a", "c") -> (2L, 1.5), // (1,3) d2 + (3,4) d1
      ("b", "c") -> (1L, 1.0)))
  }

  test("canonical ordering and same-token pairs") {
    val got = counts(Seq("b a a b"))
    // (b,a)d1 (b,a)d2 (a,a)d1 (a,b)d2 (a,b)d1
    assert(got(("a", "b")) === (4L, 1.0 + 0.5 + 0.5 + 1.0))
    assert(got(("a", "a")) === (1L, 1.0))
    assert(got.keys.forall { case (a, b) => a <= b })
  }

  test("window-1 is adjacency only; counts add across documents") {
    val got = counts(Seq("x y z", "x y"), window = 1)
    assert(got === Map(
      ("x", "y") -> (2L, 2.0),
      ("y", "z") -> (1L, 1.0)))
  }

  test("minTermCount prunes pairs but preserves original positions") {
    // "rare" occurs once; with window=1 its neighbors never pair THROUGH it
    val got = counts(Seq("a rare b", "a b"), window = 1, minTermCount = 2)
    // surviving vocabulary: a (2x), b (2x); doc 1 has no surviving
    // ADJACENT pair (a and b sit 2 apart there — a pruned token still
    // occupies its position), doc 2 contributes (a,b) once
    assert(got === Map(("a", "b") -> (1L, 1.0)))
  }

  test("degenerate docs contribute nothing") {
    val got = counts(Seq("", "solo", "  ", "p q"))
    assert(got === Map(("p", "q") -> (1L, 1.0)))
  }
}

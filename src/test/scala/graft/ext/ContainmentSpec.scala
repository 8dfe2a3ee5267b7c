package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Containment]] — asymmetric (subsumption) near-dup detection. The
  * corpus-scale face is oracle-checked as x73_containment; here the
  * directional semantics, the Jaccard blind spot it exists for, and the
  * dedup winner rule are pinned on crafted documents. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // doc 2 = a 4-token sliver of doc 1; doc 3 unrelated; doc 4 = the
  // sliver plus one token doc 1 lacks (partial containment)
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta"),
    (3L, "one two three four five six seven"),
    (4L, "alpha beta gamma delta omega"))
    .toDF("doc_id", "text")

  private def pairMap(minContainment: Double)
      : Map[(Long, Long), (Double, Double)] =
    Containment.pairs(docs, "doc_id", "text", n = 3,
        minContainment = minContainment)
      .select("id_a", "id_b", "containment_a", "containment_b")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("a contained prefix scores containment 1.0 where Jaccard is low") {
    val p = pairMap(0.9)
    // doc 2: shingles {abc, bcd}, both inside doc 1's 8 -> C(2->1)=1.0,
    // C(1->2)=2/8=0.25
    assert(p((1L, 2L)) === ((0.25, 1.0)))
    // Jaccard of the same pair = 2/8 = 0.25 — invisible at any high bar
    val j = NgramJaccard.pairs(docs, "doc_id", "text", n = 3,
      minJaccard = 0.9)
    assert(j.filter(col("id_a") === 1 && col("id_b") === 2).count() === 0)
  }

  test("partial containment is exact and direction-aware") {
    val p = pairMap(0.6)
    // doc 4: 3 shingles, 2 inside doc 1 -> 2/3; reverse = 2/8
    assert(p((1L, 4L)) === ((0.25, 0.6667)))
    // doc 2's 2 shingles are both inside doc 4's 3; reverse = 2/3
    assert(p((2L, 4L)) === ((1.0, 0.6667)))
  }

  test("unrelated documents never pair") {
    val p = Containment.pairs(docs, "doc_id", "text", n = 3,
      minContainment = 0.0)
    assert(p.filter(col("id_a") === 3L || col("id_b") === 3L).count() === 0)
  }

  test("dedupContained drops the contained side, keeps container + unrelated") {
    val kept = Containment.dedupContained(docs, "doc_id", "text", n = 3,
        minContainment = 0.9)
      .select("doc_id").as[Long].collect().toSet
    // 2 ⊂ 1 (and 2 ⊂ 4): doc 2 drops; 1, 3, 4 survive
    assert(kept === Set(1L, 3L, 4L))
  }

  test("frequency cap drops stop-shingle candidates (documented recall trade)") {
    // the one shared shingle appears in all 3 docs; cap 2 < 3 removes it
    // from the inverted index so no candidate pair can form through it
    val many = Seq(
      (1L, "x y z common common2 common3"),
      (2L, "common common2 common3"),
      (3L, "p q r common common2 common3"))
      .toDF("doc_id", "text")
    val capped = Containment.pairs(many, "doc_id", "text", n = 3,
      minContainment = 0.9, maxShingleFreq = 2)
    assert(capped.count() === 0)
    val uncapped = Containment.pairs(many, "doc_id", "text", n = 3,
      minContainment = 0.9)
    assert(uncapped.count() > 0)
  }
}

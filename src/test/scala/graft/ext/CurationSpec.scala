package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Curation]] — mixture weights and token-budget selection; the
  * documents-table faces are oracle-checked as x47_mixture /
  * x48_token_budget. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("mixtureWeights: alpha=1 is the natural mix, alpha<1 flattens") {
    val docs = Seq(
      ("web", 900L), ("web", 100L), // 1000 tokens
      ("code", 200L), ("books", 50L), ("books", 50L)
    ).toDF("source", "n_tokens")
    val natural = Curation.mixtureWeights(docs, alpha = 1.0)
      .select(col("source"), col("weight")).as[(String, Double)]
      .collect().toMap
    assert(math.abs(natural("web") - 1000.0 / 1300) < 1e-6)
    assert(math.abs(natural("code") - 200.0 / 1300) < 1e-6)

    val flat = Curation.mixtureWeights(docs, alpha = 0.3)
      .select(col("source"), col("weight")).as[(String, Double)]
      .collect().toMap
    // temperature upsamples the small domain, downsamples the big one
    assert(flat("books") > natural("books"))
    assert(flat("web") < natural("web"))
    assert(math.abs(flat.values.sum - 1.0) < 1e-5)
  }

  test("tokenBudget: two-level decomposition equals the single global window") {
    // deterministic pseudo-random corpus with heavy rank ties
    val docs = (1L to 500L).map { i =>
      (i, 10L + (i * 37 % 90), (i * 13 % 25).toInt)
    }.toDF("doc_id", "n_tokens", "n_chars")

    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val oracle = docs
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 7000)
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("doc_id")).as[(Long, Long, Long)].collect().toSeq

    for (b <- Seq(1, 7, 64)) {
      val got = Curation.tokenBudget(docs, budget = 7000L, buckets = b)
        .orderBy(col("doc_id")).as[(Long, Long, Long)].collect().toSeq
      assert(got === oracle, s"buckets=$b")
    }
  }

  test("domainCap keeps exactly n top-ranked rows per domain") {
    val docs = (1L to 100L).map { i =>
      (i, "s" + (i % 4), (i * 13 % 40).toInt)
    }.toDF("doc_id", "source", "n_chars")
    val out = Curation.domainCap(docs, n = 5, keyCol = "source")
      .select("doc_id", "source", "rank_in_domain")
      .as[(Long, String, Int)].collect()
    assert(out.groupBy(_._2).forall(_._2.length == 5))
    // rank 1 in each domain is the (n_chars desc, doc_id) max
    val byHand = (1L to 100L).map(i => (i, "s" + (i % 4), (i * 13 % 40).toInt))
      .groupBy(_._2).map { case (srcKey, rows) =>
        srcKey -> rows.sortBy(r => (-r._3, r._1)).take(5).map(_._1).toSet
      }
    out.groupBy(_._2).foreach { case (srcKey, rows) =>
      assert(rows.map(_._1).toSet === byHand(srcKey), srcKey)
    }
  }

  test("classSample: exact k per class, deterministic, growth-stable draws") {
    val docs = (1L to 200L).map(i => (i, "c" + (i % 3)))
      .toDF("doc_id", "cls")
    val a = Curation.classSample(docs, k = 10, "cls", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.classSample(docs, k = 10, "cls", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(a === b && a.size === 30)
    // class smaller than k contributes everything
    val small = Curation.classSample(docs.filter($"doc_id" <= 5), 10,
      "cls", "doc_id").count()
    assert(small === 5)
    // growth: doubling the corpus never ADDS an old id to the sample —
    // survivors of the bigger draw that are old ids were already drawn
    val grown = docs.unionByName(
      (201L to 400L).map(i => (i, "c" + (i % 3))).toDF("doc_id", "cls"))
    val g = Curation.classSample(grown, k = 10, "cls", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(g.filter(_ <= 200L).subsetOf(a))
  }

  test("weightedSample: deterministic, k-bounded, weight-biased, w<=0 excluded") {
    val docs = (1L to 200L).map { i =>
      (i, "s" + (i % 2), if (i == 7L) 1e9 else if (i % 50 == 0) 0.0 else 1.0)
    }.toDF("doc_id", "src", "w")
    val a = Curation.weightedSample(docs, k = 10, "w", "doc_id",
      strataCol = Some("src")).select("doc_id").as[Long].collect().toSet
    val b = Curation.weightedSample(docs, k = 10, "w", "doc_id",
      strataCol = Some("src")).select("doc_id").as[Long].collect().toSet
    assert(a === b && a.size === 20)
    // zero-weight rows are unsampleable by the A-ES contract
    assert(a.forall(_ % 50 != 0))
    // key = -ln(u)/w: the 1e9-weight row has key ~0 and must win its
    // stratum's first slot
    val first = Curation.weightedSample(docs, k = 1, "w", "doc_id",
      strataCol = Some("src")).select("doc_id").as[Long].collect().toSet
    assert(first.contains(7L))
    // global face (TakeOrdered) picks the same k smallest keys as a
    // single-stratum window would
    val g = Curation.weightedSample(docs, k = 15, "w", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val one = Curation.weightedSample(docs.withColumn("c", lit(1)),
      k = 15, "w", "doc_id", strataCol = Some("c"))
      .select("doc_id").as[Long].collect().toSet
    assert(g === one && g.size === 15)
  }

  test("mixtureDraw: quotas sum to total, apportionment tracks weights, deterministic") {
    // three sources with 100/60/40 docs and token mass ∝ doc count
    val docs = ((1 to 100).map(i => (i.toLong, "a", 10L))
      ++ (101 to 160).map(i => (i.toLong, "b", 10L))
      ++ (161 to 200).map(i => (i.toLong, "c", 10L)))
      .toDF("doc_id", "src", "n_tokens")
    val drawn = Curation.mixtureDraw(docs, total = 50L, sourceCol = "src",
      alpha = 1.0)
    assert(drawn.count() === 50L)
    val bySrc = drawn.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    // alpha=1 = natural mix: 25/15/10
    assert(bySrc === Map("a" -> 25L, "b" -> 15L, "c" -> 10L))
    // deterministic rerun
    val again = Curation.mixtureDraw(docs, total = 50L, sourceCol = "src",
      alpha = 1.0).select("doc_id").as[Long].collect().toSet
    assert(again === drawn.select("doc_id").as[Long].collect().toSet)
    // alpha -> 0 flattens toward equal shares
    val flat = Curation.mixtureDraw(docs, total = 51L, sourceCol = "src",
      alpha = 0.001).groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(flat === Map("a" -> 17L, "b" -> 17L, "c" -> 17L))
  }

  test("mixtureDraw: a source smaller than its quota yields all it has, no silent redistribution") {
    val docs = ((1 to 5).map(i => (i.toLong, "tiny", 1000L))
      ++ (6 to 105).map(i => (i.toLong, "big", 10L)))
      .toDF("doc_id", "src", "n_tokens")
    // tiny has 5 docs but ~83% of the token mass at alpha=1
    val drawn = Curation.mixtureDraw(docs, total = 60L, sourceCol = "src",
      alpha = 1.0)
    val bySrc = drawn.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc("tiny") === 5L)            // capped at availability
    assert(drawn.count() < 60L)             // shortfall visible, not hidden
  }

  test("tokenBudget: constant rank column degenerates to one bucket safely") {
    val docs = Seq((1L, 5L, 7), (2L, 5L, 7), (3L, 5L, 7))
      .toDF("doc_id", "n_tokens", "n_chars")
    val got = Curation.tokenBudget(docs, budget = 10L)
      .orderBy(col("doc_id")).as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 5L), (2L, 5L, 10L)))
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[KnnGraph]] — mutual-kNN graph from any directed top-k relation.
  * Oracle face: x77_mutual_knn (exact brute-force neighbors). */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  test("mutuality filters hub asymmetry; degrees count reciprocated edges") {
    // hand-built directed top-2 lists (score irrelevant to topology):
    // 1<->2 mutual; 3->1 but 1 doesn't rank 3 (hub asymmetry); 4 isolated
    val nbrs = Seq(
      (1L, 1L, 1.00), (1L, 2L, 0.90),
      (2L, 2L, 1.00), (2L, 1L, 0.95),
      (3L, 3L, 1.00), (3L, 1L, 0.80),
      (4L, 4L, 1.00))
      .toDF("query_id", "id", "score")
    val edges = KnnGraph.mutualEdges(nbrs)
    val e = edges.select("id_a", "id_b", "score_ab", "score_ba")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(e === Seq((1L, 2L, 0.90, 0.95)))
    val corpus = Seq(1L, 2L, 3L, 4L).toDF("vec_id")
    val d = KnnGraph.degrees(corpus, edges)
      .as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("composes with exact top-k: planted twin pair is mutual, outlier isolated") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.02f)),
      (2L, Seq(1.0f, 0.0f, 0.00f)),   // twin of 1
      (3L, Seq(0.0f, 1.0f, 0.00f)),
      (4L, Seq(0.0f, 0.98f, 0.2f)))   // twin-ish of 3
      .toDF("vec_id", "embedding")
    val nbrs = Similarity.bruteForceTopKAgg(vecs, vecs, k = 2,
      idCol = "vec_id", qidCol = "vec_id")
    val d = KnnGraph.degrees(vecs,
        KnnGraph.mutualEdges(nbrs), "vec_id")
      .as[(Long, Long)].collect().toMap
    // k=2 minus the self slot leaves 1 neighbor each: 1<->2 and 3<->4
    assert(d === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}

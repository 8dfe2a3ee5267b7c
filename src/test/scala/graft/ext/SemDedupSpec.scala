package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SemDedup]] — cluster-blocked semantic dedup. Vectors are built so the
  * true cluster assignment and duplicate structure are known by
  * construction; the corpus-scale face (real embeddings, DuckDB closure)
  * is oracle-checked as x40_semdedup. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated directions in R^4 plus per-id tiny jitter:
    * ids 1-3 hug e1 (cluster A), ids 4-6 hug e2 (cluster B).
    * 1 and 2 are near-identical (cos > 0.999); 3 is same cluster but
    * farther (cos ~ 0.95 to 1); 4 and 5 near-identical in B; 6 apart. */
  private def vec(main: Int, eps: Float): Seq[Float] = {
    val v = Array.fill(4)(0.0f)
    v(main) = 1.0f
    v(3) = eps
    v.toSeq
  }

  private def corpus: DataFrame = Seq(
    (1L, vec(0, 0.00f)),
    (2L, vec(0, 0.01f)),
    (3L, vec(0, 0.40f)),
    (4L, vec(1, 0.00f)),
    (5L, vec(1, 0.01f)),
    (6L, vec(1, 0.40f))
  ).toDF("vec_id", "embedding")

  /** Centroids = the two axis directions. */
  private def cents: DataFrame = Seq(
    (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (20L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("assignExact blocks by nearest centroid with id tie-break") {
    val got = SemDedup.assignExact(corpus, cents)
      .select(col("vec_id"), col("cluster")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L))
    // exact tie (vector equidistant to both centroids) -> smaller cid
    val tied = Seq((9L, Seq(1.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val t = SemDedup.assignExact(tied, cents)
      .select(col("cluster")).as[Long].head()
    assert(t === 10L)
  }

  test("pairs form only inside a cluster, never across") {
    val got = SemDedup.pairs(corpus, cents, threshold = 0.99)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (4L, 5L)))
    // cross-cluster cosines are ~0 here, but even a high cross-cluster
    // cosine would be invisible: 3 and 6 share eps=0.4 jitter
    // (cos(3,6) ~ 0.14) and no pair (3,6) can ever appear.
    assert(!got.contains((3L, 6L)))
  }

  test("dedup keeps min-id survivors and passes non-duplicates through") {
    val got = SemDedup.dedup(corpus, cents, threshold = 0.99)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(got === Set(1L, 3L, 4L, 6L))
  }

  test("threshold monotonicity: higher threshold, more survivors") {
    val strict = SemDedup.dedup(corpus, cents, threshold = 0.9999).count()
    val loose = SemDedup.dedup(corpus, cents, threshold = 0.90).count()
    assert(strict >= loose)
    // at 0.90 the eps=0.4 members fold into their cluster-mates too
    assert(loose === 2L)
    // chains merge transitively: 3 links to 1 via 0.90-threshold edges
    val labels = Dedup.connectedComponents(
      SemDedup.pairs(corpus, cents, threshold = 0.90))
      .as[(Long, Long)].collect().toMap
    assert(labels(3L) === 1L && labels(6L) === 4L)
  }
}

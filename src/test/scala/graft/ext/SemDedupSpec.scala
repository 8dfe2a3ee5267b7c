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

  // ---- skew guard (oversized-cluster path) ----

  /** N byte-identical copies of e1 — the degenerate mega-cluster the guard
    * exists for (every row lands in cluster 10). */
  private def degenerate(n: Int, zero: Boolean = false): DataFrame = {
    val v: Seq[Float] =
      if (zero) Seq(0.0f, 0.0f, 0.0f, 0.0f) else Seq(1.0f, 0.0f, 0.0f, 0.0f)
    (1 to n).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
  }

  test("guard: degenerate identical mega-cluster completes with O(N) edges") {
    val n = 100
    val p = SemDedup.pairs(degenerate(n), cents, threshold = 0.95,
      maxClusterSize = 4)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    // two-level identity star: exactly N-1 edges, never N^2/2 pairs
    assert(p.length === n - 1)
    assert(p.forall { case (a, b) => a < b })
    // all N collapse to the min-id survivor
    val kept = SemDedup.dedup(degenerate(n), cents, threshold = 0.95,
      maxClusterSize = 4).select(col("vec_id")).as[Long].collect().toSeq
    assert(kept === Seq(1L))
  }

  test("guard: all-zero embeddings (NaN cosine) still collapse by identity") {
    // pinned contract: byte-identical => duplicate even where cosine is
    // undefined; the star edge is verified by vector equality, not cosine
    val kept = SemDedup.dedup(degenerate(50, zero = true), cents,
      threshold = 0.95, maxClusterSize = 4)
      .select(col("vec_id")).as[Long].collect().toSeq
    assert(kept === Seq(1L))
  }

  test("guard: survivors match the exact path where both are feasible") {
    // corpus + byte-identical copies (7 of 1, 8 of 4): cap=2 forces BOTH
    // clusters through the guarded path; cap=1<<16 keeps the exact path
    val dup = corpus.union(Seq(
      (7L, vec(0, 0.00f)), (8L, vec(1, 0.00f))).toDF("vec_id", "embedding"))
    def survivors(cap: Int): Set[Long] =
      SemDedup.dedup(dup, cents, threshold = 0.99, maxClusterSize = cap,
        lshDim = 4)
        .select(col("vec_id")).as[Long].collect().toSet
    val exact = survivors(1 << 16)
    val guarded = survivors(2)
    assert(exact === Set(1L, 3L, 4L, 6L))
    assert(guarded === exact)
    // and the guarded edge set still respects the id_a < id_b contract
    val p = SemDedup.pairs(dup, cents, threshold = 0.99, maxClusterSize = 2,
      lshDim = 4).select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(p.forall { case (a, b) => a < b })
  }

  test("guard: bucketCap bounds a near-identical (non-byte-equal) mega-cluster") {
    // every vector unique bytes, all within cos>=0.999 of e1: identity
    // collapse keeps all 40 as reps; every rep lands in the same LSH
    // bucket of every table, so without the cap the bucket join would be
    // |reps|^2. bucketCap=8 bounds candidates; survivors stay bounded too.
    val jitter = (1 to 40).map { i =>
      (i.toLong, Seq(1.0f, 0.0f, 0.0f, i.toFloat * 1e-5f))
    }.toDF("vec_id", "embedding")
    val p = SemDedup.pairs(jitter, cents, threshold = 0.999,
      maxClusterSize = 4, lshDim = 4, bucketCap = 8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    // per table: C(8,2)=28 pairs max; 4 tables, same first-8-by-id occupants
    // => <=28 distinct pairs after dedup, never C(40,2)=780
    assert(p.nonEmpty && p.length <= 28)
    assert(p.forall { case (a, b) => a < b && a <= 8 && b <= 8 })
  }

  test("production assignment hook: no crossJoin in the plan, same result") {
    val model = Ivf.Model(Seq(
      Seq(1.0f, 0.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f, 0.0f)))
    // plan contract is on pairs(): dedup() resolves components eagerly, so
    // its returned frame no longer carries the assignment subtree
    val plan = SemDedup.pairs(corpus, cents, threshold = 0.99,
      assign = Some(SemDedup.assignIvf(model)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the persisted single assignment scan is what the branches read
    assert(plan.contains("InMemoryTableScan"))
    val hooked = SemDedup.dedup(corpus, cents, threshold = 0.99,
      assign = Some(SemDedup.assignIvf(model)))
    assert(hooked.select(col("vec_id")).as[Long].collect().toSet
      === Set(1L, 3L, 4L, 6L))
    // contrast: the oracle face (assignExact) pays the crossJoin by design
    assert(SemDedup.pairs(corpus, cents, threshold = 0.99)
      .queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }
}

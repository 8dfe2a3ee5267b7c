package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSim

/** X40 — semantic deduplication (SemDeDup): cluster-blocked embedding
  * near-dup removal, the published LLM-corpus cleaning pass (Abbas et al.
  * 2023, "SemDeDup") that catches paraphrases and boilerplate rewrites the
  * textual passes (X1 exact, X2 MinHash/SimHash) cannot see.
  *
  * Shape: every embedding is assigned to its nearest centroid; the CLUSTER
  * becomes the blocking key — candidate pairs form only inside one cluster,
  * never corpus-wide. Within a cluster, exact cosine >= `threshold` edges
  * feed [[Dedup.connectedComponents]]; the min-id representative of each
  * component survives. By the SemDeDup contract, a duplicate pair whose
  * members land in DIFFERENT clusters is missed — that is the documented
  * approximation that makes the pass tractable (same role as LSH banding
  * in X2), and raising k shrinks clusters faster than it splits duplicates
  * (near-identical vectors share a nearest centroid unless it is nearly
  * equidistant to two).
  *
  * Scale story (100 TB):
  *  - assignment is one scan; the production path is
  *    [[Ivf.assign]]'s codegen'd TopCentroids kernel. [[assignExact]]
  *    here instead broadcasts the k-row centroid table and arg-maxes an
  *    exact double-accumulated cosine ([[graft.functions.CosineSimilarity]])
  *    so the assignment is bit-reproducible against an independent engine —
  *    that is what lets the whole operator be ORACLE-checked (TopCentroids
  *    accumulates float products; its last-ulp ties are fine for IVF
  *    probing but not for a cross-engine equality contract);
  *  - the within-cluster self-join shuffles once on cluster id; cost is
  *    Σ|cluster|², so pick k ≈ N / targetClusterSize (SemDeDup uses ~10k
  *    clusters for 100 M docs). A skewed cluster is handled IN CODE, not
  *    by advice: [[pairs]] caps exact blocking at `maxClusterSize` and
  *    routes oversized clusters through identity-collapse + in-cluster
  *    LSH (see its scaladoc) so one mega-cluster can never degenerate the
  *    pass to all-pairs;
  *  - component merge collects only the EDGE set (duplicates above a high
  *    cosine threshold — tiny), not the corpus (see
  *    [[Dedup.connectedComponents]]'s driver/distributed switch).
  *
  * Centroids come from the caller: [[Ivf.train]]'s Lloyd model for
  * production, or any deterministic vector set (the oracle query uses the
  * first k corpus vectors verbatim so the reference engine can replicate
  * the assignment arithmetic exactly).
  */
object SemDedup {

  /** Corpus plus a `cluster` column: nearest centroid by EXACT
    * double-accumulated cosine, ties broken toward the smallest centroid
    * id. Centroids `(cidCol, vecCol)` are broadcast (k rows). */
  def assignExact(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cidCol: String = "vec_id"): DataFrame = {
    val cents = broadcast(
      centroids.select(col(cidCol).as("__cid"), col(vecCol).as("__cvec")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(cosineSim(col(vecCol), col("__cvec")).desc, col("__cid"))
    corpus.crossJoin(cents)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("cluster", col("__cid"))
      .drop("__cid", "__cvec", "__rn")
  }

  /** Within-cluster near-dup edges: (id_a, id_b, cosine) with
    * id_a < id_b and exact cosine >= threshold.
    *
    * Skew guard (enforced, not advisory): a cluster larger than
    * `maxClusterSize` never enters the exact Σ|cluster|² self-join — a
    * near-constant-embedding corpus would otherwise put most of N in one
    * cluster and the "blocked" join degenerates to all-pairs. Oversized
    * clusters route through a two-step bounded path instead:
    *
    *  1. byte-identical vectors collapse first (`xxhash64` over the raw
    *     array — the degenerate corpora that CAUSE mega-clusters are
    *     dominated by literal repeats): each identity group emits
    *     |group|−1 star edges to its min-id member, never |group|²/2
    *     pairs, and only the min-id representative goes on;
    *  2. the representatives pair up through multi-table sign-hash LSH
    *     buckets *within* the cluster ([[Similarity.lshTableBuckets]] —
    *     same kernel as the corpus-wide X2/X3 paths), so candidate
    *     volume is Σ per-bucket occupancy², not |cluster|².
    *
    * Both steps verify candidates with the same exact cosine >= threshold
    * filter as the small-cluster path, so edges that do form are identical
    * in kind; what the guard trades away is recall on non-identical pairs
    * whose vectors land in no common bucket — the standard LSH
    * approximation, confined to clusters that exceed the cap. Clusters at
    * or under `maxClusterSize` keep the exact SemDeDup contract
    * bit-for-bit (the oracle face never crosses the cap). */
  def pairs(corpus: DataFrame, centroids: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cidCol: String = "vec_id",
      maxClusterSize: Int = 1 << 16,
      lshBits: Int = 8, lshTables: Int = 4, lshSeed: Long = 42,
      lshDim: Int = 64): DataFrame = {
    val assigned = assignExact(corpus, centroids, idCol, vecCol, cidCol)
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("cluster"))
    // cluster-size tag: one row per centroid (k rows — always broadcastable)
    val sizes = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__csize"))
    val tagged = assigned.join(broadcast(sizes), Seq("cluster"))

    def verified(cand: DataFrame): DataFrame = cand
      .select(col("id_a"), col("id_b"),
        cosineSim(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)

    // exact path: clusters within the cap
    val small = tagged.filter(col("__csize") <= maxClusterSize).drop("__csize")
    val sa = small.as("a")
    val sb = small.as("b")
    val exactEdges = verified(
      sa.join(sb, col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.vec").as("va"), col("b.vec").as("vb")))

    // guarded path: oversized clusters. The identity collapse itself must
    // not recreate single-key skew (one identity group = one shuffle key),
    // so the star is TWO-LEVEL: members link to a salted sub-representative
    // (64-way parallel even for a single billion-row identity group), and
    // the ≤64 sub-reps per group link to the global min. Connected
    // components only need connectivity — star shape is irrelevant.
    val saltBuckets = 64
    val big = tagged.filter(col("__csize") > maxClusterSize).drop("__csize")
      .withColumn("__vh", xxhash64(col("vec")))
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(saltBuckets)))
    val wSub = Window.partitionBy(col("cluster"), col("__vh"), col("__salt"))
    val subGrouped = big.withColumn("__srep", min(col("id")).over(wSub))
    val subStarEdges = verified(
      subGrouped.filter(col("id") =!= col("__srep"))
        .select(col("__srep").as("id_a"), col("id").as("id_b"),
          col("vec").as("va"), col("vec").as("vb")))
    val subReps = subGrouped.filter(col("id") === col("__srep"))
      .select(col("cluster"), col("__vh"), col("id"), col("vec"))
    val wIdent = Window.partitionBy(col("cluster"), col("__vh"))
    val grouped = subReps.withColumn("__rep", min(col("id")).over(wIdent))
    val topStarEdges = verified(
      grouped.filter(col("id") =!= col("__rep"))
        .select(col("__rep").as("id_a"), col("id").as("id_b"),
          col("vec").as("va"), col("vec").as("vb")))
    val starEdges = subStarEdges.unionByName(topStarEdges)
    val reps = grouped.filter(col("id") === col("__rep"))
      .select(col("cluster"), col("id"), col("vec"))
    val bucketed = reps.select(col("cluster"), col("id"), col("vec"),
      explode(Similarity.lshTableBuckets(
        col("vec"), lshDim, lshBits, lshTables, lshSeed)).as("bucket"))
    val ba = bucketed.as("a")
    val bb = bucketed.as("b")
    val lshEdges = verified(
      ba.join(bb, col("a.cluster") === col("b.cluster")
          && col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.vec").as("va"), col("b.vec").as("vb"))
        .dropDuplicates("id_a", "id_b"))

    exactEdges.unionByName(starEdges).unionByName(lshEdges)
  }

  /** Full semantic dedup: drop every non-representative member of each
    * within-cluster duplicate component; keep all corpus columns.
    * `maxClusterSize` is the skew guard documented on [[pairs]]. */
  def dedup(corpus: DataFrame, centroids: DataFrame, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cidCol: String = "vec_id", maxClusterSize: Int = 1 << 16): DataFrame = {
    val edges = pairs(corpus, centroids, threshold, idCol, vecCol, cidCol,
      maxClusterSize)
    val losers = Dedup.connectedComponents(edges)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  *  - assignment is one scan. The ORACLE face uses [[assignExact]]
  *    (broadcast k-row centroid table, exact double-accumulated cosine
  *    arg-max — bit-reproducible against an independent engine, which is
  *    what lets the operator be oracle-checked). The PRODUCTION face
  *    passes an `assign` hook — [[pairs]]/[[dedup]] accept any
  *    corpus ⇒ corpus+`cluster` function, e.g. [[Ivf.assign]]'s codegen'd
  *    TopCentroids kernel — so the N×k crossJoin+window of the oracle
  *    face never appears in a production plan (see SemDedupSpec's plan
  *    assertion);
  *  - the within-cluster self-join shuffles once on cluster id; cost is
  *    Σ|cluster|², so pick k ≈ N / targetClusterSize (SemDeDup uses ~10k
  *    clusters for 100 M docs). A skewed cluster is handled IN CODE, not
  *    by advice: [[pairs]] caps exact blocking at `maxClusterSize` and
  *    routes oversized clusters through identity-collapse + in-cluster
  *    LSH with per-bucket occupancy caps (see its scaladoc), bounding the
  *    candidate volume of literal-repeat skew completely and of
  *    near-identical-noise skew to `bucketCap`² per bucket;
  *  - the assignment is persisted (MEMORY_AND_DISK): it feeds the size
  *    tag plus the small/big branches, and without the persist every
  *    downstream action would recompute the assignment scan;
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
    * id. Centroids `(cidCol, vecCol)` are broadcast (k rows).
    *
    * ORACLE face only — the N×k crossJoin + per-id window makes the
    * assignment bit-reproducible for a cross-engine equality contract but
    * is the dominant cost at corpus scale. Production callers pass
    * [[pairs]]/[[dedup]] an `assign` hook ([[Ivf.assign]]) instead. */
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

  /** `assign` hook for the production path: nearest-centroid assignment
    * through [[Ivf]]'s codegen'd TopCentroids kernel (one map-only scan,
    * no join, no window). Recall caveat vs [[assignExact]]: float-sum
    * last-ulp ties can assign a vector sitting exactly between two
    * centroids to either — irrelevant for dedup blocking. */
  def assignIvf(model: Ivf.Model, vecCol: String = "embedding")
      : DataFrame => DataFrame =
    corpus => Ivf.assign(corpus, model, vecCol)
      .withColumn("cluster", col("list_id")).drop("list_id")

  /** Within-cluster near-dup edges: (id_a, id_b, cosine) with
    * id_a < id_b and exact cosine >= threshold.
    *
    * Stage 0 — identity collapse, CORPUS-WIDE (round 8; previously only
    * the mega-cluster branch paid it): byte-identical vectors
    * (`xxhash64` over the raw array) collapse to their min-id member
    * BEFORE any quadratic stage. Exact duplicates are the single most
    * common duplicate class in a real corpus (re-crawls, mirrors,
    * replicated shards), and without the collapse an m-copy identity
    * group costs m²/2 pairs in the exact join AND m²/2 edges into
    * connected components — measured on the 100×-replicated bench set
    * (every vector × 100 copies): 529 s → the collapse turns that into
    * m−1 star edges and ONE representative in the quadratic stage.
    * Mechanics, pinned by the guard specs:
    *  - the star is TWO-LEVEL and salted (members → salted sub-rep →
    *    global min-id rep, `saltBuckets`-way parallel) so a single
    *    billion-row identity group never becomes one shuffle key;
    *  - star edges are verified by EXACT VECTOR EQUALITY against the
    *    representative's actual vector (carried by the same ordered
    *    window that picks the representative), so an xxhash64 collision
    *    can never merge unrelated vectors — a collided row forms no
    *    false edge and simply stays put (~2⁻⁶⁴-per-pair recall loss,
    *    the documented cost of collision safety);
    *  - identity is strictly stronger than any cosine threshold ≤ 1, so
    *    identical vectors — INCLUDING all-zero embeddings, whose cosine
    *    is undefined (NaN) and which the cosine filter would silently
    *    drop — always form an edge, with `cosine` emitted as 1.0 by
    *    definition. (Pinned contract: byte-identical ⇒ duplicate,
    *    regardless of whether the cosine is numerically defined.)
    *
    * Skew guard (enforced, not advisory): a cluster whose REPRESENTATIVE
    * count exceeds `maxClusterSize` never enters the exact Σ|cluster|²
    * self-join — a near-constant-embedding corpus would otherwise put
    * most of N in one cluster and the "blocked" join degenerates to
    * all-pairs. Oversized clusters route their representatives through
    * multi-table sign-hash LSH buckets *within* the cluster
    * ([[Similarity.lshTableBuckets]] — same kernel as the corpus-wide
    * X2/X3 paths), with per-bucket occupancy capped at `bucketCap`
    * (row_number by id inside each (cluster, bucket)): candidate volume
    * is bounded by Σ min(occupancy, bucketCap)² even when a mega-cluster
    * of near-identical-but-not-byte-identical vectors lands every
    * representative in the SAME bucket of every table. LSH-path
    * candidates are verified by the same exact cosine >= threshold
    * filter as the small-cluster path.
    *
    * What the guard trades away, precisely: recall on non-identical pairs
    * whose vectors share no common bucket, and on pairs beyond the
    * occupancy cap — the standard LSH approximation, confined to clusters
    * that exceed the cap. Clusters at or under `maxClusterSize` keep the
    * exact SemDeDup contract on identity REPRESENTATIVES: every distinct
    * vector pair is compared by exact cosine; identical copies reach the
    * same component through their star edges (identical vectors have
    * identical cosines to every third vector, so collapsing them loses
    * no connectivity). Survivor sets are therefore unchanged from the
    * full clique formulation; only the EDGE LIST shape differs (star +
    * rep-clique instead of full clique).
    *
    * @param assign optional production assignment hook (corpus ⇒ corpus
    *   plus `cluster` column, e.g. [[assignIvf]]); None = [[assignExact]]
    *   (the oracle face). */
  def pairs(corpus: DataFrame, centroids: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cidCol: String = "vec_id",
      maxClusterSize: Int = 1 << 16,
      lshBits: Int = 8, lshTables: Int = 4, lshSeed: Long = 42,
      lshDim: Int = 64, bucketCap: Int = 1024,
      assign: Option[DataFrame => DataFrame] = None): DataFrame = {
    val assigned = assign.map(_(corpus))
      .getOrElse(assignExact(corpus, centroids, idCol, vecCol, cidCol))
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("cluster"))
      // one assignment scan total: feeds the collapse windows once
      .persist(StorageLevel.MEMORY_AND_DISK)

    def verified(cand: DataFrame): DataFrame = cand
      .select(col("id_a"), col("id_b"),
        cosineSim(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)

    // ---- stage 0: corpus-wide identity collapse (doc above). The
    // collapse itself must not recreate single-key skew (one identity
    // group = one shuffle key), so the star is TWO-LEVEL: members link
    // to a salted sub-representative (saltBuckets-way parallel even for
    // a single billion-row identity group), and the ≤saltBuckets
    // sub-reps per group link to the global min. Connected components
    // only need connectivity — star shape is irrelevant. Each level's
    // ordered running window carries BOTH the representative id and its
    // actual vector, so the identity check compares the member to the
    // real representative (never to itself).
    val saltBuckets = 64
    val hashed = assigned
      .withColumn("__vh", xxhash64(col("vec")))
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(saltBuckets)))
    // star edges exist iff identical vectors are duplicates under the
    // caller's threshold — true for any threshold <= 1 (cosine's range)
    val thresholdAdmitsIdentity = lit(threshold <= 1.0)
    def starEdges(grouped: DataFrame, repCol: String, repVecCol: String)
        : DataFrame = grouped
      .filter(col("id") =!= col(repCol))
      .filter(col("vec") === col(repVecCol) && thresholdAdmitsIdentity)
      .select(col(repCol).as("id_a"), col("id").as("id_b"),
        lit(1.0).as("cosine"))
    val wSub = Window.partitionBy(col("cluster"), col("__vh"), col("__salt"))
      .orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val subGrouped = hashed
      .withColumn("__srep", first(col("id")).over(wSub))
      .withColumn("__srepVec", first(col("vec")).over(wSub))
    val subStarEdges = starEdges(subGrouped, "__srep", "__srepVec")
    val subReps = subGrouped.filter(col("id") === col("__srep"))
      .select(col("cluster"), col("__vh"), col("id"), col("vec"))
    val wIdent = Window.partitionBy(col("cluster"), col("__vh"))
      .orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grouped = subReps
      .withColumn("__rep", first(col("id")).over(wIdent))
      .withColumn("__repVec", first(col("vec")).over(wIdent))
    val topStarEdges = starEdges(grouped, "__rep", "__repVec")
    val allStarEdges = subStarEdges.unionByName(topStarEdges)
    // representatives are what every quadratic stage below sees; persist —
    // they feed the size tag, both sides of the exact join, and the LSH
    // branch (recomputing the two collapse windows 5× would dominate)
    val reps = grouped.filter(col("id") === col("__rep"))
      .select(col("cluster"), col("id"), col("vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // cluster-size tag over REPRESENTATIVES: one row per centroid
    // (k rows — always broadcastable)
    val sizes = reps.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__csize"))
    val tagged = reps.join(broadcast(sizes), Seq("cluster"))

    // exact path: clusters whose representative count is within the cap
    val small = tagged.filter(col("__csize") <= maxClusterSize).drop("__csize")
    val sa = small.as("a")
    val sb = small.as("b")
    val exactEdges = verified(
      sa.join(sb, col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.vec").as("va"), col("b.vec").as("vb")))

    // guarded path: oversized rep-clusters through capped LSH buckets
    val big = tagged.filter(col("__csize") > maxClusterSize).drop("__csize")
    val wBucket = Window.partitionBy(col("cluster"), col("bucket"))
      .orderBy(col("id"))
    val bucketed = big.select(col("cluster"), col("id"), col("vec"),
      explode(Similarity.lshTableBuckets(
        col("vec"), lshDim, lshBits, lshTables, lshSeed)).as("bucket"))
      .withColumn("__occ", row_number().over(wBucket))
      .filter(col("__occ") <= bucketCap)
      .drop("__occ")
    val ba = bucketed.as("a")
    val bb = bucketed.as("b")
    val lshEdges = verified(
      ba.join(bb, col("a.cluster") === col("b.cluster")
          && col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.vec").as("va"), col("b.vec").as("vb"))
        .dropDuplicates("id_a", "id_b"))

    exactEdges.unionByName(allStarEdges).unionByName(lshEdges)
  }

  /** Full semantic dedup: drop every non-representative member of each
    * within-cluster duplicate component; keep all corpus columns.
    * `maxClusterSize` is the skew guard documented on [[pairs]]; the
    * `lsh*`/`bucketCap` knobs tune its oversized-cluster LSH stage
    * (`lshDim` should be the embedding dimension — the default 64
    * projects onto the first min(dim, 64) components); `assign` is the
    * production assignment hook ([[assignIvf]]). */
  def dedup(corpus: DataFrame, centroids: DataFrame, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cidCol: String = "vec_id", maxClusterSize: Int = 1 << 16,
      lshBits: Int = 8, lshTables: Int = 4, lshSeed: Long = 42,
      lshDim: Int = 64, bucketCap: Int = 1024,
      assign: Option[DataFrame => DataFrame] = None): DataFrame = {
    val edges = pairs(corpus, centroids, threshold, idCol, vecCol, cidCol,
      maxClusterSize, lshBits, lshTables, lshSeed, lshDim, bucketCap, assign)
    val losers = Dedup.connectedComponents(edges)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }
}

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
  *    clusters for 100 M docs). A skewed cluster is handled the same way
  *    as any hot key: re-cluster its members with a finer sub-model, or
  *    fall back to [[Similarity.nearDupPairs]]'s LSH inside it;
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
    * id_a < id_b and exact cosine >= threshold. */
  def pairs(corpus: DataFrame, centroids: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cidCol: String = "vec_id"): DataFrame = {
    val assigned = assignExact(corpus, centroids, idCol, vecCol, cidCol)
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("cluster"))
    val a = assigned.as("a")
    val b = assigned.as("b")
    a.join(b, col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineSim(col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Full semantic dedup: drop every non-representative member of each
    * within-cluster duplicate component; keep all corpus columns. */
  def dedup(corpus: DataFrame, centroids: DataFrame, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cidCol: String = "vec_id"): DataFrame = {
    val edges = pairs(corpus, centroids, threshold, idCol, vecCol, cidCol)
    val losers = Dedup.connectedComponents(edges)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }
}

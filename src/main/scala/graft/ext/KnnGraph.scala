package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X77 — mutual k-nearest-neighbor graph construction: turn a DIRECTED
  * top-k neighbor list (X3's output — brute-force at eval scale, LSH/IVF
  * at corpus scale) into the UNDIRECTED mutual-kNN graph: edge (a, b)
  * exists iff a ranks b in its top-k AND b ranks a in its own. Mutuality
  * is the standard asymmetry filter before graph clustering or
  * density-based dedup (hub vectors appear in everyone's top-k —
  * one-directional edges to a hub say little; a RECIPROCATED edge is
  * strong evidence of a genuine neighborhood), and mutual degree is the
  * local-density signal (isolated vector = 0, clique member = k).
  *
  * Backend-agnostic by design: this operator consumes any
  * (query_id, id, score, rank) relation, so the SAME graph code runs on
  * exact brute-force neighbors (oracle-checkable) and on approximate
  * LSH/IVF neighbors (the 100 TB path) — the X3 family decides recall,
  * this decides topology.
  *
  * Plan: one self equi-join on the (a, b)=(b, a) key pair — the neighbor
  * list is N·k rows, so the join is linear in it, partitioned by the
  * first endpoint; degrees are one partial-agged explode. No crossJoin
  * anywhere.
  */
object KnnGraph {

  /** Undirected mutual edges (id_a < id_b) with both directed scores.
    * Self-edges (query_id = id, rank-1 self hits from X3) are dropped
    * first. Input columns: `qidCol`, `idCol`, `score`. */
  def mutualEdges(neighbors: DataFrame, qidCol: String = "query_id",
      idCol: String = "id"): DataFrame = {
    val e = neighbors
      .filter(col(s"`$qidCol`") =!= col(s"`$idCol`"))
      .select(col(s"`$qidCol`").as("src"), col(s"`$idCol`").as("dst"),
        col("score"))
    val fwd = e.as("f")
    val rev = e.as("r")
    fwd.join(rev,
        col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
      .filter(col("f.src") < col("f.dst"))
      .select(col("f.src").as("id_a"), col("f.dst").as("id_b"),
        col("f.score").as("score_ab"), col("r.score").as("score_ba"))
  }

  /** Per-vertex mutual degree over `corpus` ids (vectors with no mutual
    * neighbor report degree 0 — the isolation signal is the point).
    * Output: (idCol, mutual_degree). */
  def degrees(corpus: DataFrame, edges: DataFrame,
      idCol: String = "vec_id"): DataFrame = {
    val ends = edges.select(explode(array(col("id_a"), col("id_b"))).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__deg"))
    corpus.select(col(s"`$idCol`"))
      .join(ends, col(s"`$idCol`") === col("__v"), "left")
      .select(col(s"`$idCol`"),
        coalesce(col("__deg"), lit(0L)).as("mutual_degree"))
  }
}

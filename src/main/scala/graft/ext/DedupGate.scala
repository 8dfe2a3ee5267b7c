package graft.ext

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Size gate for the dedup probe sets (r17, guide §3.1 "broadcast only
  * what fits"): [[LineDedup]] and [[SpanDedup]] probe the corpus rows
  * against a hash set that is tiny BY ASSUMPTION (boilerplate lines /
  * repeated k-grams are the head of a skewed frequency distribution).
  * The pre-r17 shape hard-hinted `broadcast(set)` — on a template-heavy
  * 100 TB crawl (exactly the corpus these operators target) the
  * assumption can fail and the unconditional hint builds a driver-killing
  * broadcast relation regardless of size.
  *
  * The gate materializes the set once (`localCheckpoint(true)` — the set
  * is needed by the join anyway, so this adds a block write of the tiny
  * relation, not a recomputation) with an `observe()` count riding the
  * SAME materialization job (the established convergence-count trick from
  * [[Dedup]]'s CC loop — no second action), then:
  *   - at or below `spark.graft.dedup.broadcastMaxKeys` keys: broadcast,
  *     the fast path — the corpus side is never shuffled for the probe;
  *   - above: the plain join, which the planner runs as a shuffled
  *     hash/sort-merge join on the 8-byte hash — the corpus side shuffles
  *     (hash, position, id) METADATA rows only, never text, so the
  *     fallback stays inside the operators' no-text-on-the-wire contract.
  *
  * Default threshold: 4 M keys ≈ 32 MB of longs, ~64–128 MB as a built
  * LongHashedRelation per executor — inside the "a few hundred MB is
  * fine" broadcast band (guide §3.1) on any production executor, with
  * margin for the driver that must also hold it. Clusters with small
  * drivers lower it; fat-driver deployments can raise it. Local default
  * keeps the driver's bench comparable (the sf sets' probe sets are
  * orders of magnitude below it, so the gate picks the same broadcast
  * plan the r16 hint forced).
  */
object DedupGate {

  /** Conf key for the broadcast-vs-shuffle threshold, in distinct keys. */
  val maxKeysConf = "spark.graft.dedup.broadcastMaxKeys"
  val defaultMaxKeys: Long = 4000000L

  /** The probe set, materialized and counted in one job, broadcast-hinted
    * only when it fits. */
  def sizeGated(keys: DataFrame): DataFrame = {
    val spark = keys.sparkSession
    val maxKeys =
      spark.conf.get(maxKeysConf, defaultMaxKeys.toString).toLong
    val obs = Observation()
    val ck = keys.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
    val n = obs.get("n").asInstanceOf[Long]
    if (n <= maxKeys) broadcast(ck) else ck
  }
}

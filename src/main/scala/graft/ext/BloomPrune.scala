package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions.{bloomBuild, bloomMightContain}

/** X9 extension — Bloom-filter join pruning: filter a huge fact side with
  * a compact sketch of the dim-side keys BEFORE the exact join.
  *
  * Why it matters at 100 TB: a semi join shuffles (or at best broadcasts a
  * hash set of) every dim key to every fact partition, and the fact side
  * flows to the join operator in full. A Bloom bitset is fixed-size
  * (numBits/8 bytes — 128 KB at the default 2^20 bits) regardless of key
  * count, ORs together map-side, and the probe is a codegen'd bit test in
  * the scan stage — so ~(1 − selectivity − fpp) of the fact rows die
  * before any exchange. This is the manual form of Spark's own runtime
  * row-level filtering, exposed as an operator so it can feed ANY
  * downstream plan (joins the optimizer won't inject filters into,
  * pre-shuffle pruning before aggregation, etc.).
  *
  * Exactness: Bloom filters have no false negatives, so the residual semi
  * join on the survivors restores exact semantics; false positives only
  * cost the residual join a little extra input (~fpp of the fact).
  */
object BloomPrune {

  /** `fact` rows whose `factKey` appears in `dim.dimKey` — exact semi-join
    * semantics, Bloom-pruned before the join. The sketch build runs
    * eagerly (one job over `dim`); its result is a bounded numBits/8-byte
    * literal in the returned plan, the same shape Spark's runtime filters
    * inject via scalar subquery.
    *
    * numBits sizing: fpp ≈ (1 − e^(−k·n/m))^k; the 2^20 default holds
    * ~100 k keys at k=5 under 2% fpp — size up for bigger dims. */
  def semiJoinPruned(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bitset = dim
      .agg(bloomBuild(xxhash64(col(s"`$dimKey`")), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pruned = fact.filter(
      bloomMightContain(lit(bitset), xxhash64(col(s"`$factKey`")), numHashes))
    pruned.join(
      dim.select(col(s"`$dimKey`")).distinct(),
      pruned(s"`$factKey`") === col(s"`$dimKey`"),
      "left_semi")
  }
}

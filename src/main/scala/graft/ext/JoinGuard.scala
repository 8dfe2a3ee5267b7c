package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X80 — join-explosion guard: measure per-key fan-out BEFORE running a
  * join, and run the join with a hard bound on it. The failure it
  * prevents is the classic pipeline killer: an "id" that is unique in
  * dev data but a many-many hot key in production (null-ish sentinel
  * keys, default values, replayed events), turning an innocent join into
  * |L_k|·|R_k| row amplification that OOMs executors three stages later
  * — at 100 TB you want the guard to fail FAST and point at the keys,
  * not die in a downstream shuffle.
  *
  * Plan shape: two partial-agged per-key counts (each collapses its side
  * to |distinct keys| rows map-side), an inner join of the two count
  * relations (tiny vs the data), fan-out = nl·nr per key. The report
  * never touches payload columns; the guarded join only adds one
  * broadcast of the (tiny, by definition) offender key set to the plain
  * join.
  */
object JoinGuard {

  /** Per-key fan-out report, descending: (keys..., n_left, n_right,
    * fanout) for every key present on BOTH sides (one-sided keys cannot
    * amplify an inner join). `minFanout` screens the report to the
    * interesting tail (1 = every matching key). */
  def fanoutReport(left: DataFrame, right: DataFrame, keys: Seq[String],
      minFanout: Long = 1L): DataFrame = {
    def qc(c: String) = col(s"`$c`")
    val keyCols = keys.map(qc)
    val nl = left.groupBy(keyCols: _*).agg(count(lit(1)).as("n_left"))
    val nr = right.groupBy(keyCols: _*).agg(count(lit(1)).as("n_right"))
    nl.join(nr, keys)
      .withColumn("fanout", col("n_left") * col("n_right"))
      .filter(col("fanout") >= minFanout)
  }

  /** The plain inner join with offending keys EXCLUDED and accounted
    * for: returns (joined, offenders) where `offenders` is the fan-out
    * report of every key over `maxFanout`. The caller decides — log the
    * offenders and proceed, or fail the run if `offenders` is non-empty
    * (`guardedJoinOrThrow` does the latter). Exclusion keeps the join's
    * output bounded by |matches| ≤ maxFanout·|keys| instead of
    * unbounded amplification. */
  def guardedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      maxFanout: Long): (DataFrame, DataFrame) = {
    require(maxFanout >= 1, "maxFanout must be positive")
    val offenders = fanoutReport(left, right, keys, minFanout = maxFanout + 1)
    val bad = offenders.select(keys.map(c => col(s"`$c`")): _*)
      .withColumn("__bad", lit(true))
    val l = left.join(broadcast(bad), keys, "left")
      .filter(col("__bad").isNull).drop("__bad")
    (l.join(right, keys), offenders)
  }

  /** [[guardedJoin]] that FAILS the job when any key exceeds the bound —
    * the fail-fast face for pipelines where amplification is always a
    * data bug. The exception names the worst offenders. */
  def guardedJoinOrThrow(left: DataFrame, right: DataFrame,
      keys: Seq[String], maxFanout: Long): DataFrame = {
    val (joined, offenders) = guardedJoin(left, right, keys, maxFanout)
    val worst = offenders.orderBy(col("fanout").desc).limit(5).collect()
    if (worst.nonEmpty) {
      throw new IllegalStateException(
        s"join fan-out over $maxFanout on keys ${keys.mkString(",")}: " +
          worst.map(_.toString).mkString("; "))
    }
    joined
  }
}

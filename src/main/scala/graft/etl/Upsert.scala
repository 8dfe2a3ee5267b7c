package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** MERGE/upsert semantics as a batch operator: apply a change set to a
  * base table — matched keys are REPLACED by their change row, unmatched
  * change rows are INSERTED, all other base rows pass through. The
  * reference never mutates published partitions (each run writes a fresh
  * run-stamped tree — `main.py:58-60`), but any incremental pipeline on
  * top of that layout needs exactly this operator to roll a new snapshot
  * from the previous one plus a delta.
  *
  * Plan shape (the 100 TB consideration): NOT a full-outer join.
  * `base ANTI JOIN changes.keys` + `UNION ALL changes` touches the wide
  * base rows once and shuffles only the change KEYS against them — the
  * anti join's build side is the projected key set of the delta, which
  * AQE broadcasts when small (the common case: deltas ≪ base). A
  * full-outer-join formulation would shuffle the entire wide base AND
  * pay a coalesce per column; this shape is also what Delta/Iceberg
  * rewrite MERGE into when there is no update expression.
  *
  * Contract: `changes` must be unique per key (one change per key per
  * batch — the same precondition SQL MERGE enforces with
  * "cannot update the same row twice"); enforce upstream with
  * [[graft.ext.Dedup]] / last-writer-wins when deltas carry versions.
  */
object Upsert {

  /** @param keys join key columns, present in both frames; schemas must
    *   union (same columns, any order).
    * @param broadcastKeys force (Some(true)) or forbid (Some(false)) the
    *   delta-key broadcast; None gates it on the optimizer's size
    *   estimate (the q14 pattern). The explicit hint exists because
    *   without column statistics a filter-derived delta inherits its
    *   parent scan's size estimate, so the auto gate stays conservative
    *   exactly when the caller KNOWS the delta is small — the common
    *   incremental-pipeline case where the broadcast anti join keeps the
    *   wide base entirely unshuffled (measured at the 100× set: the SMJ
    *   anti shape is also unstable under memory pressure — 5-29 s spread
    *   vs a steady 4.5 s broadcast path). */
  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
      broadcastKeys: Option[Boolean] = None): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val keyCols = keys.map(k => col(s"`$k`"))
    val keySet = changes.select(keyCols: _*).distinct()
    val bcast = broadcastKeys.getOrElse(
      keySet.queryExecution.optimizedPlan.stats.sizeInBytes < (64L << 20))
    base
      .join(if (bcast) broadcast(keySet) else keySet, keys, "left_anti")
      .unionByName(changes)
  }

  /** Version-guarded upsert: a change replaces the base row ONLY when its
    * `versionCol` is ≥ the base row's — stale deltas lose, equal versions
    * re-apply idempotently. This is what makes folding a change stream
    * correct under OUT-OF-ORDER delivery (micro-batch order and version
    * order need not agree); the plain [[upsert]] is last-batch-wins.
    *
    * Plan shape: one extra NARROW pass over the base (keys + version
    * only) to adjudicate, then the same anti-join + union — the wide base
    * rows are still touched exactly once. */
  def upsertVersioned(base: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val baseKV = base.select((keys :+ versionCol).map(c => col(s"`$c`")): _*)
    val accepted = changes.alias("c")
      .join(baseKV.alias("b"), keys, "left")
      .filter(col(s"b.`$versionCol`").isNull ||
        col(s"c.`$versionCol`") >= col(s"b.`$versionCol`"))
      .select(changes.columns.map(c => col(s"c.`$c`")): _*)
    upsert(base, accepted, keys)
  }
}

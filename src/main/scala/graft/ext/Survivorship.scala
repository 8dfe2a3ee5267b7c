package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X66 — survivorship / golden-record merge: collapse every entity's
  * update history (or its matched duplicate cluster) into ONE best
  * record, field by field — the step after record linkage (X44 scores
  * pairs, X2 clusters them; something must then MERGE each cluster) and
  * the "current state" read over any append-only update log.
  *
  * Rule implemented: per field, LATEST NON-NULL wins — the standard MDM
  * default (a null in a later update means "not provided", never "erase";
  * an explicit-erase semantics is [[graft.etl.Upsert]]'s replace-the-row
  * contract instead). Determinism: recency is judged by a caller-supplied
  * ORDER column that must be unique per key (compose version and a
  * tiebreaker into one scalar when it is not — the x66 face shows the
  * encoding); the per-field winner is then unique.
  *
  * Plan shape: ONE hash aggregation — `max_by(field, order-if-non-null)`
  * per field, all fields in the same partial-aggregated groupBy — no
  * window, no self-join, no per-field shuffle. Completeness metadata
  * (`n_versions`, per-key latest order) rides along free.
  */
object Survivorship {

  /** One golden row per key: every field's latest non-null value plus
    * `n_versions` and `last_order` (the newest order value seen). */
  def goldenRecord(df: DataFrame, keys: Seq[String], orderCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "at least one field")
    val fieldAggs = fields.map { f =>
      max_by(col(s"`$f`"),
        when(col(s"`$f`").isNotNull, col(s"`$orderCol`"))).as(f)
    }
    val metaAggs = Seq(
      count(lit(1)).as("n_versions"),
      max(col(s"`$orderCol`")).as("last_order"))
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg((fieldAggs ++ metaAggs).head, (fieldAggs ++ metaAggs).tail: _*)
  }
}

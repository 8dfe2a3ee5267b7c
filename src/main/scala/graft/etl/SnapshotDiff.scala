package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed diff of two table versions: which rows were ADDED, REMOVED, or
  * CHANGED between snapshots — the audit face of the incremental family
  * ([[Upsert]] applies deltas, [[Scd2]] records history, this one
  * explains what a run DID; the reference's ledger answers the same
  * question one level down, at file granularity).
  *
  * Scale shape: rows are compared by a 64-bit content hash of their
  * non-key columns, so the join shuffles (key, hash) — ~16 bytes/row —
  * never the wide rows themselves. The hash is
  * `xxhash64(non-key columns...)`: collisions (~2⁻⁶⁴ per key) can only
  * mask a change, and the exactness-critical consumers (tests, the
  * oracle query) pass `exact = true` to compare null-safe structs
  * instead. Presence is tracked with synthetic flags so NULL keys and
  * all-NULL rows never masquerade as absence.
  */
object SnapshotDiff {

  /** One row per differing key: (keys..., change ∈ added|removed|changed).
    * Unchanged keys produce nothing.
    *
    * The content column is computed BELOW the join on each side (a
    * projection under the exchange), so in hash mode the shuffle really
    * does carry (key, 8-byte hash, flag) and nothing else — computing the
    * hash after the join would drag every wide attribute column through
    * both exchanges, because Catalyst prunes unused columns but never
    * pushes computed expressions below a join on its own. */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val attrCols = before.columns.filterNot(keys.contains)
    require(after.columns.filterNot(keys.contains).sorted.sameElements(attrCols.sorted),
      "snapshots must share the same non-key columns")
    def side(df: DataFrame, flag: String): DataFrame = {
      val content: Column =
        if (exact) struct(attrCols.map(c => col(s"`$c`")): _*)
        else xxhash64(attrCols.map(c => col(s"`$c`")): _*)
      df.select(keys.map(k => col(s"`$k`"))
        :+ content.as("__c") :+ lit(1).as(flag): _*)
    }
    val b = side(before, "__b").alias("b")
    val a = side(after, "__a").alias("a")
    b.join(a, keys.map(k => col(s"b.`$k`") <=> col(s"a.`$k`")).reduce(_ && _),
        "full_outer")
      .withColumn("change",
        when(col("__b").isNull, lit("added"))
          .when(col("__a").isNull, lit("removed"))
          .when(!(col("b.__c") <=> col("a.__c")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys.map(k => coalesce(col(s"b.`$k`"), col(s"a.`$k`")).as(k))
        :+ col("change"): _*)
  }

  /** Summary counts: (change, n) for added/removed/changed. */
  def summary(before: DataFrame, after: DataFrame, keys: Seq[String],
      exact: Boolean = false): DataFrame =
    diff(before, after, keys, exact)
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
      .orderBy(col("change"))
}

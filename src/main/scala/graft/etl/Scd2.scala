package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: roll a point-in-time snapshot into a
  * history table that keeps one row per (key, validity interval). The
  * reference keeps only latest-run outputs (each ETL run writes a fresh
  * run-stamped tree); SCD2 is the standard answer when consumers must ask
  * "what did this dimension row look like at time T" — history rows are
  * closed with `valid_to`, current rows carry `valid_to = NULL`.
  *
  * Semantics per key, applying a snapshot taken at `asOf`:
  *  - attribute change: the open row is CLOSED (`valid_to = asOf`) and a
  *    new open row inserted (`valid_from = asOf`);
  *  - key absent from the snapshot: the open row is CLOSED (a delete);
  *  - new key: a new open row is inserted;
  *  - unchanged: the open row passes through untouched;
  *  - already-closed history rows always pass through.
  *
  * Plan shape: closed history passes through without touching the join;
  * only OPEN rows full-outer-join the snapshot — and both sides of that
  * join are first reduced to (key, attrs): at 100 TB the open slice is
  * one row per live key (dimension-sized, not fact-sized), the change
  * test is a single null-safe struct comparison (no per-column coalesce
  * cascade), and the join shuffles by key with AQE free to broadcast the
  * smaller side. Attribute comparison uses `<=>` on a struct, so NULL
  * attribute values compare as equal (a NULL→NULL "change" is correctly
  * a no-op).
  *
  * Contract: `history` has at most one OPEN row per key (the invariant
  * this operator itself maintains); `snapshot` is unique per key.
  */
object Scd2 {

  /** @param history (key, attrs..., validFromCol, validToCol) — validTo
    *   NULL marks the open row
    * @param snapshot (key, attrs...) — same attr columns as history
    * @param asOf the snapshot's effective timestamp (column expression,
    *   e.g. `lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))`) */
  def apply(history: DataFrame, snapshot: DataFrame, keys: Seq[String],
      asOf: Column, validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val attrCols = history.columns
      .filterNot(c => keys.contains(c) || c == validFromCol || c == validToCol)
    require(attrCols.toSet.subsetOf(snapshot.columns.toSet),
      s"snapshot must carry history's attribute columns: ${attrCols.mkString(",")}")
    def attrStruct(prefix: String): Column =
      struct(attrCols.map(c => col(s"$prefix.`$c`")): _*)

    val closed = history.filter(col(s"`$validToCol`").isNotNull)
    val open = history.filter(col(s"`$validToCol`").isNull)
    val snap = snapshot
      .select((keys ++ attrCols).map(c => col(s"`$c`")): _*).alias("s")

    // presence is tested via synthetic flags so NULL keys and NULL
    // attributes never masquerade as absence in the full-outer join
    val joinedF = open.withColumn("__h", lit(1))
      .alias("h")
      .join(snap.withColumn("__s", lit(1)).alias("s"),
        keys.map(k => col(s"h.`$k`") <=> col(s"s.`$k`")).reduce(_ && _),
        "full_outer")
    val presentH = col("`__h`").isNotNull
    val presentS = col("`__s`").isNotNull
    val changed = presentH && presentS &&
      !(attrStruct("h") <=> attrStruct("s"))

    // open rows that survive unchanged
    val unchanged = joinedF.filter(presentH && presentS && !changed)
      .select(keys.map(k => col(s"h.`$k`").as(k)) ++
        attrCols.map(c => col(s"h.`$c`").as(c)) :+
        col(s"h.`$validFromCol`").as(validFromCol) :+
        col(s"h.`$validToCol`").as(validToCol): _*)
    // open rows closed because the key changed or vanished
    val toClose = joinedF.filter(presentH && (changed || !presentS))
      .select(keys.map(k => col(s"h.`$k`").as(k)) ++
        attrCols.map(c => col(s"h.`$c`").as(c)) :+
        col(s"h.`$validFromCol`").as(validFromCol) :+
        asOf.cast("timestamp").as(validToCol): _*)
    // fresh open rows: changed keys re-open with new attrs; brand-new keys
    val toOpen = joinedF.filter(presentS && (changed || !presentH))
      .select(keys.map(k => col(s"s.`$k`").as(k)) ++
        attrCols.map(c => col(s"s.`$c`").as(c)) :+
        asOf.cast("timestamp").as(validFromCol) :+
        lit(null).cast("timestamp").as(validToCol): _*)

    closed.unionByName(unchanged).unionByName(toClose).unionByName(toOpen)
  }
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X67 — publication manifest: per-partition row counts + an
  * order-independent content fingerprint for a dataset a run is about to
  * publish (or has published). The consumer-side handshake the
  * reference's file-granular ledger implies one level up: a downstream
  * reader compares the new manifest against the one it last consumed and
  * touches ONLY the partitions whose fingerprint moved — [[diff]] is
  * literally [[SnapshotDiff.diff]] over the two manifests, so the
  * partition-level screen and the row-level audit are the same operator
  * family at two granularities.
  *
  * Fingerprint: `bit_xor` of a per-row 64-bit hash — commutative and
  * associative, so it is partition-order- and shuffle-independent and
  * aggregates in one partial-agged pass (no sort, no collect). Engine
  * default row hash is codegen'd `xxhash64` over the fingerprint
  * columns; the oracle face swaps in a portable md5-based hash (the
  * X54/X60 hook pattern) so DuckDB reproduces the manifest bit-for-bit.
  *
  * Honest limits (documented, spec-pinned): XOR cancels IDENTICAL
  * duplicate row PAIRS — a partition gaining two copies of an existing
  * row keeps its fingerprint; the row COUNT catches every cardinality
  * change, so the screen misses only same-count same-xor edits
  * (~2⁻⁶⁴-rare for content changes). It is an equality SCREEN that
  * routes work to [[SnapshotDiff]], not a cryptographic digest.
  */
object Manifest {

  /** One row per partition: (partitionCols..., n_rows, content_fp).
    * @param fpCols columns folded into the row hash — pick stable,
    *   formatting-free columns (integral keys/versions), not
    *   float-rendered ones.
    * @param rowFp optional row-hash override (portable oracle face). */
  def build(df: DataFrame, partitionCols: Seq[String], fpCols: Seq[String],
      rowFp: Option[Column] = None): DataFrame = {
    require(partitionCols.nonEmpty, "at least one partition column")
    require(fpCols.nonEmpty, "at least one fingerprint column")
    val h = rowFp.getOrElse(xxhash64(fpCols.map(c => col(s"`$c`")): _*))
    df.groupBy(partitionCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("n_rows"), bit_xor(h).as("content_fp"))
  }

  /** Which partitions were added/removed/changed between two manifests —
    * [[SnapshotDiff.diff]] with the manifest rows as content. */
  def diff(before: DataFrame, after: DataFrame,
      partitionCols: Seq[String]): DataFrame =
    SnapshotDiff.diff(before, after, partitionCols)
}

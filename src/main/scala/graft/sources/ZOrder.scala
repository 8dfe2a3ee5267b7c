package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.doubleSortBits

/** Z-order (Morton-curve) layout: cluster a table so parquet min/max
  * statistics prune files for range predicates on SEVERAL columns at
  * once. A plain `sortWithinPartitions(a)` layout prunes only on its
  * lead column — files span the full range of every other column. Bit-
  * interleaving the columns' order-preserving representations makes each
  * file cover a small hyper-rectangle of the value space instead, so a
  * selective predicate on ANY interleaved column skips most files (the
  * same idea Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is a
  * write-path operator over plain parquet — the reader needs nothing,
  * row-group pruning picks it up through the ordinary stats).
  *
  * The z-value is computed with builtin bit expressions over
  * [[graft.functions.DoubleSortBits]] (order-preserving IEEE-754 bits) —
  * fully codegen'd, no UDF. Numeric columns only (cast to double; exact
  * for integers below 2^53). `bitsPerDim` top bits per column are
  * interleaved — 16 bits/dim gives 65k distinct cells per dimension,
  * far finer than any realistic file count, while keeping the z-value in
  * one long for up to 4 dims.
  */
object ZOrder {

  /** Morton code of the given numeric columns (bigint; ascending-safe). */
  def zValue(cols: Seq[Column], bitsPerDim: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    require(cols.size * bitsPerDim <= 63,
      s"${cols.size} dims x $bitsPerDim bits must fit a signed long")
    val k = cols.size
    // order-preserving bits, shifted to an UNSIGNED top-`bitsPerDim` key:
    // flip the sign bit so negative doubles sort below positives in the
    // unsigned interleave, then keep the top bits
    val keys = cols.map { c =>
      shiftrightunsigned(
        doubleSortBits(c.cast("double")).bitwiseXOR(lit(Long.MinValue)),
        64 - bitsPerDim)
    }
    // interleave: bit i of dim d lands at position i*k + (k-1-d), so the
    // FIRST column owns the most-significant bit of each group
    val terms = for {
      (key, d) <- keys.zipWithIndex
      i <- 0 until bitsPerDim
    } yield shiftleft(
      shiftrightunsigned(key, i).bitwiseAND(lit(1L)),
      i * k + (k - 1 - d))
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` clustered on the Morton curve of `zCols`: range-partition
    * by z-value (contiguous curve segments per file), sort within each
    * partition, drop the helper column. One shuffle; file count = task
    * count, so size it like any repartition. */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], outDir: String,
      numFiles: Int, bitsPerDim: Int = 16): Unit = {
    val z = zValue(zCols.map(c => col(s"`$c`")), bitsPerDim)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").option("compression", "snappy").parquet(outDir)
  }
}

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

  private def interleave(keys: Seq[Column], bitsPerDim: Int): Column = {
    val k = keys.size
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

  /** Morton code from raw order-preserving IEEE-754 bit prefixes
    * (bigint; ascending-safe; needs no statistics). CAVEAT: raw float
    * bits concentrate in the exponent — a dimension whose values span
    * few binades (e.g. uniform [0, 100]) contributes nearly-constant top
    * bits and gets NO locality from the interleave. Use [[zValueScaled]]
    * (what [[writeZOrdered]] does) unless the value range is unknowable. */
  def zValue(cols: Seq[Column], bitsPerDim: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    require(cols.size * bitsPerDim <= 63,
      s"${cols.size} dims x $bitsPerDim bits must fit a signed long")
    // flip the sign bit so negative doubles sort below positives in the
    // unsigned interleave, then keep the top bits
    val keys = cols.map { c =>
      shiftrightunsigned(
        doubleSortBits(c.cast("double")).bitwiseXOR(lit(Long.MinValue)),
        64 - bitsPerDim)
    }
    interleave(keys, bitsPerDim)
  }

  /** Morton code over MIN/MAX-SCALED fixed-point keys: each dimension is
    * linearly quantized over its actual value range, so every one of its
    * `bitsPerDim` bits discriminates regardless of where the data sits in
    * float space (measured: raw-bit interleave left a [0,100]-ranged
    * dimension unpruned — 15/16 files overlapping a 1/8 probe — because
    * all its values shared an exponent prefix; scaling fixed it). NULLs
    * quantize to slot 0 (they cluster, and min/max stats ignore them). */
  def zValueScaled(cols: Seq[Column], ranges: Seq[(Double, Double)],
      bitsPerDim: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    require(cols.size == ranges.size, "one (min,max) range per column")
    require(cols.size * bitsPerDim <= 63,
      s"${cols.size} dims x $bitsPerDim bits must fit a signed long")
    val slots = (1L << bitsPerDim) - 1
    val keys = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = if (hi > lo) hi - lo else 1.0
      val unit = least(greatest((c.cast("double") - lit(lo)) / lit(span),
        lit(0.0)), lit(1.0))
      coalesce((unit * lit(slots.toDouble)).cast("long"), lit(0L))
    }
    interleave(keys, bitsPerDim)
  }

  /** Equi-depth bucket index of `c` against sorted quantile `bounds`
    * (2^bits − 1 boundaries → index in [0, 2^bits)): a BINARY-SEARCH tree
    * of literal comparisons — `bits` comparisons per row, plain nested
    * `when`s, fully codegen'd (a higher-order-function scan over a
    * boundary array would be interpreted per element). */
  private def equiDepthKey(c: Column, bounds: Vector[Double]): Column = {
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo.toLong)
      else {
        val mid = (lo + hi + 1) / 2
        when(c >= lit(bounds(mid - 1)), tree(mid, hi)).otherwise(tree(lo, mid - 1))
      }
    coalesce(tree(0, bounds.size), lit(0L))
  }

  /** Write `df` clustered on the Morton curve of `zCols`, quantized
    * EQUI-DEPTH: one `approxQuantile` stats pass learns 2^bits − 1
    * boundaries per column, so every bit of every dimension splits the
    * DATA in half regardless of distribution. (Both linear scaling and
    * raw float bits fail on skew: measured on a lognormal-ish column,
    * min/max scaling left 16/16 files overlapping a 1/8-probability
    * probe — 90% of rows share the top slots' prefix — while equi-depth
    * prunes both dimensions.) Then range-partition by z-value
    * (contiguous curve segments per file), sort within each partition,
    * drop the helper. One stats pass + one shuffle; file count = task
    * count, so size it like any repartition.
    *
    * `bitsPerDim` defaults to 8 — 256 equi-depth slots per dimension is
    * far finer than any realistic file count, and keeps the comparison
    * tree small. */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], outDir: String,
      numFiles: Int, bitsPerDim: Int = 8): Unit = {
    require(bitsPerDim >= 1 && bitsPerDim <= 12,
      "equi-depth z-order: bitsPerDim in [1,12] (comparison tree size is 2^bits)")
    val n = (1 << bitsPerDim) - 1
    val probs = (1 to n).map(_.toDouble / (n + 1)).toArray
    // the multi-column overload computes every dimension's boundaries in
    // ONE scan — the per-column form would pay a full pass per dimension
    val allBounds = df.stat.approxQuantile(zCols.toArray, probs, 0.001)
    val keys = zCols.zip(allBounds).map { case (zc, bounds) =>
      equiDepthKey(col(s"`$zc`").cast("double"), bounds.toVector)
    }
    val z = interleave(keys, bitsPerDim)
    // partition on the top z-bits, NOT on row-count quantiles of z:
    // row-quantile boundaries fall mid-cell and smear one Morton cell
    // across two files (measured as boundary files spanning a whole
    // dimension); a prefix split makes every file exactly one aligned
    // cell, and equi-depth keys make the cells near-equal in rows anyway.
    // File count rounds down to a power of two for exact alignment.
    val partitionBits = math.max(1,
      (math.log(numFiles.toDouble) / math.log(2.0)).floor.toInt)
    val pid = shiftrightunsigned(col("__z"),
      zCols.size * bitsPerDim - partitionBits)
    df.withColumn("__z", z)
      .withColumn("__pid", pid)
      .repartitionByRange(1 << partitionBits, col("__pid"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__pid")
      .write.mode("overwrite").option("compression", "snappy").parquet(outDir)
  }
}

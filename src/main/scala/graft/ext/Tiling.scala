package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.doubleSortBits

/** X-series extension — exact global NTILE / row ranks WITHOUT a global
  * sort.
  *
  * `NTILE(n) OVER (ORDER BY v, tie)` plans as a single-partition sort in
  * every SQL engine — one task owns the whole relation, which is exactly
  * what dies first at 100 TB. But the tile of a row is pure arithmetic on
  * its GLOBAL RANK, and the global rank decomposes: bucket rows by the
  * top bits of the order-preserving IEEE-754 pattern of `v`
  * ([[graft.functions.DoubleSortBits]] — monotone, no statistics pass),
  * count rows per bucket (codegen'd partial agg, output bounded by
  * occupied buckets), turn counts into per-bucket rank offsets with a
  * cumulative sum over that TINY relation, then row_number WITHIN each
  * bucket (parallel windows, one per occupied bucket) plus the bucket's
  * offset. Two passes over the input, no row-count-sized shuffle into a
  * single task anywhere.
  *
  * Ties on `v` are broken by `tie` (make it unique for deterministic
  * output — the same contract as the window form). NULL order values rank
  * first (Spark's ASC default), via a null bucket below every real one.
  */
object Tiling {

  /** Append `__rank` (1-based exact global rank by (valueCol, tieCol))
    * and `tileCol` (NTILE(n) of that rank) to `df`.
    *
    * @param totalCol also expose the total row count under this name —
    *   with the `__rank` column this makes NTILE rank spans closed-form
    *   arithmetic downstream (base = ⌊N/n⌋, remainder tiles hold one
    *   extra row), so rank selections (medians, arbitrary order
    *   statistics per tile) cost a column predicate instead of a
    *   value-buffering aggregate (the q59 1000×-set fix: Spark's
    *   `median()` buffers every group value) */
  def ntileByValue(
      df: DataFrame, n: Int,
      valueCol: String, tieCol: String,
      tileCol: String = "tile",
      bucketBits: Int = 20,
      totalCol: Option[String] = None): DataFrame = {
    require(n >= 1, "n must be positive")
    val v = col(s"`$valueCol`").cast("double")
    // null order values sort first: park them in a bucket below every
    // representable sort-bits prefix (min long >> shift is the smallest
    // real bucket; subtract one more)
    val nullBucket = (Long.MinValue >> (64 - bucketBits)) - 1L
    val bucket = coalesce(
      shiftright(doubleSortBits(v), 64 - bucketBits), lit(nullBucket))

    val withB = df.withColumn("__b", bucket)
    // tiny relation: rows per bucket -> cumulative offset below each
    // bucket + the total row count (single-partition windows are fine
    // HERE — the relation is occupied-buckets-sized, not row-sized)
    val counts = withB.groupBy(col("__b")).agg(count(lit(1)).as("__bc"))
      .withColumn("__off",
        sum(col("__bc")).over(Window.orderBy(col("__b"))) - col("__bc"))
      .withColumn("__n", sum(col("__bc")).over(
        Window.partitionBy(lit(1))))
      .select(col("__b").as("__cb"), col("__off"), col("__n"))

    val ranked = withB.join(broadcast(counts), col("__b") === col("__cb"))
      .drop("__cb")
      .withColumn("__rank",
        row_number().over(
          Window.partitionBy(col("__b"))
            .orderBy(v.asc_nulls_first, col(s"`$tieCol`")))
          .cast("long") + col("__off"))

    // NTILE arithmetic: the first (N % n) tiles hold ceil(N/n) rows, the
    // rest floor(N/n) — SQL-standard distribution. Spark's `/` on longs
    // is true division, so integer-divide via floor (exact below 2^53).
    // The base=0 branch (N < n) never reaches the otherwise-division:
    // cut = N there, so every rank takes the first branch.
    val base = floor(col("__n") / n).cast("long")
    val rem = col("__n") % n
    val cut = rem * (base + 1)
    val tile = when(col("__rank") <= cut,
        floor((col("__rank") - 1) / (base + 1)).cast("long"))
      .otherwise(rem + floor((col("__rank") - 1 - cut) / base).cast("long")) + 1
    val tiled = ranked.withColumn(tileCol, tile.cast("long"))
    totalCol.fold(tiled)(tc => tiled.withColumn(tc, col("__n")))
      .drop("__b", "__off", "__n")
  }
}

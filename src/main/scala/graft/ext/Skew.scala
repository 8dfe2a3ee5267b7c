package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY "salting for skew").
  *
  * AQE's skew-join handling covers sort-merge joins automatically; these
  * helpers cover the remaining hot-key patterns:
  *
  *  - [[saltedAggregate]]: two-phase aggregation for group-bys where a few
  *    keys dominate — phase 1 aggregates (key, salt) partials across
  *    `saltFactor` reducers, phase 2 merges per key. Functions must be
  *    algebraic (re-aggregatable): sum/count/min/max.
  *  - [[saltedBroadcastLeft]]: replicate a small right side `saltFactor`
  *    times so a skewed large left joins against salted copies instead of
  *    funneling a hot key through one task.
  */
object Skew {

  /** Two-phase salted aggregation.
    * @param aggs (inputCol → (phase1Agg, phase2Agg, outName)); e.g.
    *             sum/sum, count/sum, min/min, max/max. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      countCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    // backtick-quote user names: the engine's energy measures are dotted
    def qc(c: String) = col(s"`$c`")
    val phase1 =
      countCols.map(c => count(qc(c)).as(s"__cnt_$c")) ++
        sumCols.map(c => sum(qc(c)).as(s"__sum_$c")) ++
        minCols.map(c => min(qc(c)).as(s"__min_$c")) ++
        maxCols.map(c => max(qc(c)).as(s"__max_$c"))
    require(phase1.nonEmpty, "no aggregates requested")
    val p1 = salted
      .groupBy((keys.map(qc) :+ col("__salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
    val phase2 =
      countCols.map(c => sum(qc(s"__cnt_$c")).as(s"${c}_count")) ++
        sumCols.map(c => sum(qc(s"__sum_$c")).as(s"${c}_sum")) ++
        minCols.map(c => min(qc(s"__min_$c")).as(s"${c}_min")) ++
        maxCols.map(c => max(qc(s"__max_$c")).as(s"${c}_max"))
    p1.groupBy(keys.map(qc): _*).agg(phase2.head, phase2.tail: _*)
  }

  /** Salted broadcast join for a skewed LEFT against a small RIGHT: the left
    * gets a random salt in [0, saltFactor), the right is exploded once per
    * salt value, and the equi-join key becomes (key, salt) — hot keys spread
    * over `saltFactor` tasks. Right side must be broadcast-small. */
  def saltedBroadcastLeft(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(saltFactor)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<bigint>")))
    saltedLeft.join(broadcast(saltedRight),
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** X78 — salted join for skewed FACT–FACT equi-joins (neither side
    * broadcast-small, a few keys dominating): the pattern AQE's skew
    * handling cannot reach — AQE splits oversized SMJ partitions after
    * the shuffle files exist; when one KEY is the whole partition and
    * the join is hash-based (or the skew sits under an aggregation), the
    * hot key still funnels through one task. The manual remedy, as an
    * operator:
    *
    *  1. heavy keys are found EXACTLY (one partial-agged count over the
    *     left, thresholded — the heavy relation is tiny by definition of
    *     "heavy": at most |left|/threshold rows, and it broadcasts);
    *  2. light keys take the plain equi-join, untouched;
    *  3. heavy LEFT rows scatter across `saltFactor` sub-keys (salt =
    *     hash of a caller-named high-cardinality column — deterministic,
    *     no RNG state), heavy RIGHT rows replicate once per salt, and
    *     the join key becomes (key, salt): the hot key's work spreads
    *     over `saltFactor` tasks at the cost of replicating ONLY the
    *     heavy slice of the right side;
    *  4. union. Result ≡ the plain inner join, row for row — pinned by
    *     the x78 oracle, which IS the plain join in SQL.
    *
    * Pick the smaller/less-skewed side as `right`: its heavy slice is
    * what replicates. `saltFactor` ≈ the per-task row budget you want
    * for the hottest key.
    *
    * NULL join keys follow plain-inner-join SQL semantics: a NULL key
    * never equals anything (not even another NULL), so NULL-keyed rows
    * from either side produce NO output rows. Mechanically they route to
    * the light path (the null-rejecting heavy probe can't mark them) and
    * the light equi-join drops them there — exactly what the plain join
    * the operator must equal does. Pinned by SaltedJoinSpec's null-key
    * test; callers who need null-as-value matching should coalesce keys
    * to a sentinel first. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      distributeCol: String, saltFactor: Int = 16,
      heavyThreshold: Long = 4000000): DataFrame = {
    require(saltFactor >= 2, "saltFactor must be >= 2")
    require(heavyThreshold >= 1, "heavyThreshold must be >= 1")
    def qc(c: String) = col(s"`$c`")
    val keyCols = keys.map(qc)
    val heavy = left.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > heavyThreshold)
      .select(keyCols: _*)
      .withColumn("__hv", lit(true))
    val lt = left.join(broadcast(heavy), keys, "left")
    val rt = right.join(broadcast(heavy), keys, "left")
    val lightJoin = lt.filter(col("__hv").isNull).drop("__hv")
      .join(rt.filter(col("__hv").isNull).drop("__hv"), keys)
    val lHeavy = lt.filter(col("__hv") === true).drop("__hv")
      .withColumn("__salt",
        pmod(xxhash64(qc(distributeCol)), lit(saltFactor.toLong)))
    val rHeavy = rt.filter(col("__hv") === true).drop("__hv")
      .withColumn("__salt", explode(
        sequence(lit(0L), lit(saltFactor.toLong - 1))))
    val heavyJoin = lHeavy.join(rHeavy, keys :+ "__salt").drop("__salt")
    lightJoin.unionByName(heavyJoin)
  }
}

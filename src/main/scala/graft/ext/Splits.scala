package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X79 — leakage-safe dataset splitting: train/val/test assignment where
  * the split unit is a GROUP (user, session, near-dup cluster, domain),
  * not the row. Row-level hash splits (the x7 face) leak whenever
  * correlated rows straddle the boundary — two near-identical documents
  * of one author, one in train and one in test, IS contamination the X15
  * screen then has to catch after the fact. Splitting by a group key
  * makes the guarantee structural: every row of a group lands in the
  * SAME split, because the assignment hashes only the group key.
  *
  * Mechanics: portable md5 hex of the group key thresholded at the
  * cumulative weight boundaries (the x7 rule, lifted from row id to
  * group key). Deterministic, RNG-free, growth-stable: a group's split
  * never changes as the corpus grows, and re-runs reproduce bit-for-bit
  * on any engine with md5. Row-local projection — zero shuffle, no
  * group materialization; 100 TB splits at scan speed.
  *
  * Weights are fractions of HASH SPACE, so realized sizes converge to
  * the weights at group granularity (a heavy group drags its whole mass
  * with it — that is the point; use [[Curation.matchDistribution]] after
  * splitting if exact sizes matter more than leakage).
  */
object Splits {

  /** 32 hex digits of 'f' — the top of md5's string-ordered hash space. */
  private val HexTop = BigInt("f" * 32, 16)

  /** Adds `outCol` with the split name per row, assigned by the md5 of
    * `groupCol` against cumulative weight thresholds.
    * @param splits (name, weight) in order; weights normalize. */
  /** The cumulative hash-space thresholds as 32-digit hex strings (md5
    * hex compares lexicographically = numerically for fixed-width
    * lowercase hex). Public so oracle faces embed EXACTLY the bounds
    * [[byGroup]] assigns with — same double arithmetic, zero drift. */
  def boundsHex(splits: Seq[(String, Double)]): Seq[String] = {
    val z = splits.map(_._2).sum
    val cums = splits.map(_._2 / z).scanLeft(0.0)(_ + _).tail.init
    cums.map { c =>
      val v = (BigDecimal(HexTop) * BigDecimal(c)).toBigInt
      v.toString(16).reverse.padTo(32, '0').reverse
    }
  }

  def byGroup(df: DataFrame, groupCol: String,
      splits: Seq[(String, Double)] = Seq(
        "train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    require(splits.map(_._1).distinct.size == splits.size,
      "duplicate split name")
    val bounds = boundsHex(splits)
    val h = md5(col(s"`$groupCol`").cast("string"))
    val assigned = bounds.zip(splits.map(_._1)).foldRight(
      lit(splits.last._1)) { case ((bound, name), rest) =>
      when(h < bound, name).otherwise(rest)
    }
    // earlier thresholds must win: foldRight builds when-chains in split
    // order, so the first bound the hash is under decides
    df.withColumn(outCol, assigned)
  }

  /** X96 — temporal train/test split with an EMBARGO gap.
    *
    * Random and group splits are both wrong for time-ordered data: a
    * model trained on Tuesday's rows and tested on Monday's has seen
    * the future, and even a clean time cutoff leaks through
    * AUTOCORRELATION — rows just after the cutoff are near-copies of
    * rows just before it (the same sessions, the same documents
    * re-crawled), so test metrics read training memorization. The
    * production contract (standard in forecast/backtest evaluation) is
    * cutoff + embargo: train takes everything up to the cutoff instant,
    * the embargo window after it is DROPPED from both sides, test
    * starts after the embargo.
    *
    * Cutoff selection is an exact ORDER STATISTIC, all-integer: rank
    * ceil(n × trainPermille / 1000) of the epoch-microsecond value
    * ([[Quantiles.valueAtRankLong]] — two metadata-sized passes, no
    * global sort, no float interpolation), so the cutoff is an existing
    * timestamp and both engines compute the identical instant from the
    * identical integer arithmetic. Boundary semantics: the cutoff
    * INSTANT belongs wholly to train (an instant cannot be split — rows
    * tied at the cutoff all land in train even if that overshoots the
    * requested fraction); the embargo interval is half-open:
    * `cutoff < ts < cutoff + embargo` → "embargo",
    * `ts >= cutoff + embargo` → "test". Assignment itself is a row-local
    * projection against the broadcast cutoff literal — scan-speed at
    * any SF, the [[byGroup]] scale property.
    *
    * @param trainPermille train fraction in 1/1000ths (an integer, so
    *   the rank is exact: 800 → ceil(0.8 n) with no 0.8-in-binary drift)
    * @param embargo a Spark interval literal body, e.g. "7 days" */
  def byTimeEmbargo(df: DataFrame, timeCol: String,
      trainPermille: Int = 800, embargo: String = "1 day",
      outCol: String = "split"): DataFrame = {
    require(trainPermille >= 1 && trainPermille <= 999,
      s"trainPermille in [1, 999], got $trainPermille")
    val ts = col(s"`$timeCol`")
    // NOT ts.cast("long") — that is epoch SECONDS; unix_micros is the
    // microsecond-exact instant (DuckDB side: epoch_us)
    val withUs = df.select(unix_micros(ts).as("__us"))
    val n = withUs.filter(col("__us").isNotNull).count()
    require(n > 0, s"byTimeEmbargo: no non-null $timeCol rows")
    val rank = (n * trainPermille + 999L) / 1000L // = ceil(n·p/1000), exact
    val cutUs = Quantiles.valueAtRankLong(withUs, "__us", rank)
    val cutoff = timestamp_micros(lit(cutUs))
    val gapEnd = cutoff + expr(s"INTERVAL $embargo")
    df.withColumn(outCol,
      when(ts.isNull, lit(null).cast("string"))
        .when(ts <= cutoff, "train")
        .when(ts < gapEnd, "embargo")
        .otherwise("test"))
  }

  /** Split-integrity audit: per group, how many distinct splits its rows
    * landed in — every row > 1 is a leakage bug. Empty result = clean.
    * (For [[byGroup]] output this is structurally empty; the audit
    * exists for EXTERNALLY assigned splits — a migrated corpus whose
    * split column predates group-safe assignment.) */
  def leakageAudit(df: DataFrame, groupCol: String,
      splitCol: String = "split"): DataFrame =
    df.groupBy(col(s"`$groupCol`"))
      .agg(countDistinct(col(s"`$splitCol`")).as("n_splits"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_splits") > 1)
}

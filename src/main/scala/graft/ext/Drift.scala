package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X69 — distribution-drift monitoring: Population Stability Index
  * between two snapshots of a value column — the statistic every
  * production scoring/ingest pipeline watches (feature drift, corpus
  * drift between crawls, upstream schema-silent unit changes). Rule of
  * thumb: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken.
  *
  * PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b) over a FIXED binning both
  * snapshots share ([lo, hi] split into `bins` equal widths, plus an
  * underflow and an overflow bin — fixed edges, because quantile-derived
  * edges would move WITH the drift being measured). Empty bins are
  * Laplace-smoothed (`epsilon` added to every bin count before
  * normalizing) so the log stays finite; smoothing is part of the pinned
  * contract, not a hidden fudge.
  *
  * Plan shape: one partial-aggregated histogram per side (bins×groups
  * rows — tiny), a bin-keyed outer join of the two histograms, and the
  * formula — driver-free, scan-bound, trivially 100 TB-safe. The same
  * histograms serve any divergence; [[psi]] reports per-bin terms too
  * (`psiDetail`) so the alert can say WHERE the mass moved.
  */
object Drift {

  /** Bin id of a value: 0 = underflow, 1..bins = interior, bins+1 =
    * overflow; nulls drop upstream (a null is absence, not a value).
    * Public since round 11 so the streaming face
    * ([[graft.streaming.StreamingDrift]]) bins with EXACTLY this
    * expression — a drifted bin edge would silently desynchronize the
    * maintained histogram from the batch statistic. */
  def binOf(v: Column, bins: Int, lo: Double, hi: Double): Column =
    when(v < lo, lit(0))
      .when(v >= hi, lit(bins + 1))
      .otherwise(floor((v - lo) / ((hi - lo) / bins)).cast("int") + 1)

  private def histogram(df: DataFrame, groupCols: Seq[String],
      valueCol: String, bins: Int, lo: Double, hi: Double,
      side: String): DataFrame =
    df.filter(col(s"`$valueCol`").isNotNull)
      .groupBy((groupCols.map(c => col(s"`$c`"))
        :+ binOf(col(s"`$valueCol`"), bins, lo, hi).as("bin")): _*)
      .agg(count(lit(1)).as(side))

  /** Per-bin PSI terms: (groupCols..., bin, p, q, term). Sum of `term`
    * over bins = the PSI. */
  def psiDetail(before: DataFrame, after: DataFrame,
      groupCols: Seq[String], valueCol: String, bins: Int = 10,
      lo: Double = 0.0, hi: Double = 1.0,
      epsilon: Double = 1e-6): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val hb = histogram(before, groupCols, valueCol, bins, lo, hi, "nb")
    val ha = histogram(after, groupCols, valueCol, bins, lo, hi, "na")
    val joined = hb.join(ha, groupCols :+ "bin", "full_outer")
      .select((groupCols.map(c => col(s"`$c`")) :+ col("bin")
        :+ coalesce(col("nb"), lit(0L)).as("nb")
        :+ coalesce(col("na"), lit(0L)).as("na")): _*)
    val w = Window
      .partitionBy(groupCols.map(c => col(s"`$c`")): _*)
    val p = (col("nb") + epsilon) / sum(col("nb") + epsilon).over(w)
    val q = (col("na") + epsilon) / sum(col("na") + epsilon).over(w)
    joined
      .withColumn("p", p).withColumn("q", q)
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
  }

  /** One row per group: (groupCols..., psi). */
  def psi(before: DataFrame, after: DataFrame, groupCols: Seq[String],
      valueCol: String, bins: Int = 10, lo: Double = 0.0,
      hi: Double = 1.0, epsilon: Double = 1e-6,
      roundTo: Int = 4): DataFrame =
    psiDetail(before, after, groupCols, valueCol, bins, lo, hi, epsilon)
      .groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(round(sum(col("term")) + lit(1e-9), roundTo).as("psi"))

  /** Categorical PSI: the same (p−q)·ln(p/q) statistic with the
    * CATEGORY as the bin — share drift of a discrete column (source,
    * lang, country, event type) between snapshots. The support set is
    * the categories present on either side (the full-outer join defines
    * it identically on both engines); a category appearing or vanishing
    * is exactly what the smoothing keeps finite and the score punishes.
    * Same tiny-histogram plan shape as [[psi]]. */
  def psiCategorical(before: DataFrame, after: DataFrame,
      groupCols: Seq[String], catCol: String, epsilon: Double = 1e-6,
      roundTo: Int = 4): DataFrame = {
    def counts(df: DataFrame, side: String): DataFrame =
      df.filter(col(s"`$catCol`").isNotNull)
        .groupBy((groupCols.map(c => col(s"`$c`"))
          :+ col(s"`$catCol`").as("cat")): _*)
        .agg(count(lit(1)).as(side))
    val joined = counts(before, "nb").join(counts(after, "na"),
        groupCols :+ "cat", "full_outer")
      .select((groupCols.map(c => col(s"`$c`")) :+ col("cat")
        :+ coalesce(col("nb"), lit(0L)).as("nb")
        :+ coalesce(col("na"), lit(0L)).as("na")): _*)
    val w = Window.partitionBy(groupCols.map(c => col(s"`$c`")): _*)
    val p = (col("nb") + epsilon) / sum(col("nb") + epsilon).over(w)
    val q = (col("na") + epsilon) / sum(col("na") + epsilon).over(w)
    joined.withColumn("term", (p - q) * log(p / q))
      .groupBy(groupCols.map(c => col(s"`$c`")): _*)
      .agg(round(sum(col("term")) + lit(1e-9), roundTo).as("psi"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per group:
    * max |F_before(x) − F_after(x)| over the pooled sample — the
    * binning-free complement to [[psi]] (PSI needs range knowledge and
    * quantizes; KS sees any continuous shift but says less about WHERE).
    *
    * Computation: pool both sides, collapse to per-DISTINCT-value side
    * counts first (so ties across sides are consumed together and the
    * CDF is only ever read at whole-value boundaries — the textbook tie
    * treatment), then one per-group window ordered by value accumulates
    * n_a·CB(v) − n_b·CA(v): an exact INTEGER equal to
    * (F_b − F_a)(v)·n_b·n_a — no float CDF accumulation anywhere; the
    * max |·| / (n_b·n_a) is the statistic. Groups partition the sort, so
    * parallelism is per-group; within a group this is the one genuinely
    * order-requiring statistic in the family — there is no shuffle-free
    * exact KS (the window input is one row per distinct value, already
    * far smaller than the data).
    *
    * Contract for one-sided groups: a group present in only one of the
    * two samples has no two-sample statistic (the CDF of the empty side
    * is undefined, and n_b·n_a = 0 would divide by zero) — such groups
    * emit NO row, mirroring [[psi]]'s defined-support contract. Callers
    * who need to surface them should anti-join the output against the
    * group universe. */
  def ks(before: DataFrame, after: DataFrame, groupCols: Seq[String],
      valueCol: String, roundTo: Int = 4): DataFrame = {
    val gcols = groupCols.map(c => col(s"`$c`"))
    def side(df: DataFrame, tag: Int): DataFrame =
      df.filter(col(s"`$valueCol`").isNotNull)
        .select(gcols :+ col(s"`$valueCol`").as("v") :+ lit(tag).as("side"): _*)
    val pooled = side(before, 0).unionByName(side(after, 1))
    // per distinct value: how many rows of each side sit exactly at v —
    // ties collapse HERE, before any ordering exists, so the CDF is only
    // ever read at whole-v boundaries (the textbook tie treatment)
    val perV = pooled.groupBy(gcols :+ col("v"): _*)
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("cb"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("ca"))
    val wg = Window
      .partitionBy(gcols: _*)
    val ord = wg.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // running integer n_a·CB(v) − n_b·CA(v) = (F_b − F_a)(v) · n_b·n_a:
    // exact arithmetic, no float CDF accumulation
    val run = perV
      .withColumn("nb", sum(col("cb")).over(wg))
      .withColumn("na", sum(col("ca")).over(wg))
      .withColumn("run",
        sum(col("cb") * col("na") - col("ca") * col("nb")).over(ord))
    run.groupBy(gcols: _*)
      .agg(round(
        max(abs(col("run"))).cast("double") /
          (first(col("nb")) * first(col("na"))) + lit(1e-9), roundTo)
        .as("ks"),
        first(col("nb")).as("__nb"), first(col("na")).as("__na"))
      // one-sided groups (nb or na = 0) have no two-sample statistic:
      // drop them rather than emit NULL/Inf (contract in the scaladoc)
      .filter(col("__nb") > 0 && col("__na") > 0)
      .drop("__nb", "__na")
  }

  /** X93 — embedding-distribution drift: the vector-space face of this
    * module (PSI/KS monitor scalars; an embedding column drifts when the
    * encoder, the upstream corpus mix, or a preprocessing step changes,
    * and every ANN/semantic-dedup index built on it silently degrades).
    * Per dimension: mean and sample variance on each side, and the
    * standardized mean difference |μ_cur − μ_ref| / s_pooled (Cohen's d
    * with the pooled two-sample standard deviation) — the classic
    * magnitude-free shift score, comparable across dimensions of
    * different scales. Plan: ONE partial-aggregated scan per side
    * (posexplode to (dim, x), hash-agg — the Ivf/Pca training shape),
    * then a d-row join; nothing row-sized is ever shuffled, so the pass
    * costs two scans at ANY corpus size. Zero pooled variance (both
    * sides constant in a dimension) yields NULL smd — callers treat a
    * constant-to-constant mean jump as its own signal. */
  def embeddingDrift(ref: DataFrame, cur: DataFrame,
      vecCol: String = "embedding", roundTo: Int = 4): DataFrame = {
    def stats(df: DataFrame, side: String): DataFrame =
      df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(avg(col("x")).as(s"mean_$side"),
          var_samp(col("x")).as(s"var_$side"),
          count(lit(1)).as(s"n_$side"))
    val j = stats(ref, "ref").join(stats(cur, "cur"), "dim")
    val pooledVar = (
      (col("n_ref") - 1) * col("var_ref") + (col("n_cur") - 1) * col("var_cur")
    ) / (col("n_ref") + col("n_cur") - 2)
    j.select(
      col("dim"),
      round(col("mean_ref") + lit(1e-9), roundTo).as("mean_ref"),
      round(col("mean_cur") + lit(1e-9), roundTo).as("mean_cur"),
      when(pooledVar > 0,
        round(abs(col("mean_cur") - col("mean_ref")) / sqrt(pooledVar)
          + lit(1e-9), roundTo)).as("smd"))
  }
}

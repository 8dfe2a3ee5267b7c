package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X47/X48 — corpus-curation arithmetic: domain mixture weights and
  * token-budget selection. The two decisions every pretraining-data
  * pipeline makes after cleaning: HOW MUCH of each source to sample
  * (temperature-scaled mixture, the DoReMi/Pile recipe) and WHICH
  * documents fit the token budget (ranked cumulative cutoff).
  *
  * Plan shape, 100 TB reading: mixture weights are one hash aggregation
  * to |sources| rows (tiny) plus scalar normalization — all driver-free.
  * Token-budget selection needs a GLOBAL running sum; a single
  * all-rows window is a one-partition bottleneck at corpus scale, so it
  * is decomposed exactly over range buckets of the rank column: a
  * within-bucket window runs per bucket in parallel, the |buckets|-row
  * subtotal relation rolls up through one tiny window, and the offsets
  * broadcast back. Identical result to the single window, no partition
  * ever sees more than one bucket.
  */
object Curation {

  /** Temperature-scaled mixture weights per `sourceCol`: share_i =
    * tokens_i / Σ tokens; weight_i = share_i^alpha / Σ share^alpha.
    * alpha < 1 upsamples small domains (alpha = 1 → natural mix). */
  def mixtureWeights(docs: DataFrame, sourceCol: String = "source",
      tokensCol: String = "n_tokens", alpha: Double = 0.3): DataFrame = {
    val bySrc = docs.groupBy(col(s"`$sourceCol`").as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col(s"`$tokensCol`")).as("n_tokens"))
    val tot = bySrc.agg(sum(col("n_tokens")).as("__tot"))
    val shared = bySrc.crossJoin(broadcast(tot))
      .withColumn("share", col("n_tokens") / col("__tot"))
      .withColumn("__pow", pow(col("share"), lit(alpha)))
    val z = shared.agg(sum(col("__pow")).as("__z"))
    shared.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("__pow") / col("__z"), 6).as("weight"))
  }

  /** Keep the top-ranked documents whose cumulative `tokensCol` stays
    * within `budget`. Ranking = (`rankCol` DESC, `idCol` ASC) — a
    * deterministic total order. A document is kept when the running
    * total THROUGH it is ≤ budget (first-fit prefix, the standard
    * corpus-freeze rule).
    *
    * Exact two-level running sum: rows bucket by value ranges of
    * `rankCol` (ties share a bucket, so bucket order is consistent with
    * the row order), local window per bucket, per-bucket totals roll up
    * through a |buckets|-row window and broadcast back as offsets.
    */
  def tokenBudget(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", tokensCol: String = "n_tokens",
      rankCol: String = "n_chars", buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "at least one bucket")
    val id = col(s"`$idCol`"); val tok = col(s"`$tokensCol`")
    val rk = col(s"`$rankCol`")
    val base = docs.select(id.as("__id"), tok.cast("long").as("__tok"),
      rk.cast("double").as("__rk"))

    // range-bucket on the rank value (DESC order ⇒ high rank = bucket 0);
    // min/max are one tiny broadcast aggregate
    val bounds = base.agg(min(col("__rk")).as("__lo"), max(col("__rk")).as("__hi"))
    val bucketed = base.crossJoin(broadcast(bounds)).withColumn("__b",
      when(col("__hi") === col("__lo"), lit(0)).otherwise(
        least(lit(buckets - 1), floor(
          (col("__hi") - col("__rk")) / ((col("__hi") - col("__lo")) / buckets))
          .cast("int"))))

    val wLocal = Window.partitionBy(col("__b"))
      .orderBy(col("__rk").desc, col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__local", sum(col("__tok")).over(wLocal))

    // |buckets| rows: running offset of all earlier buckets
    val wBucket = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = local.groupBy(col("__b")).agg(sum(col("__tok")).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(wBucket), lit(0L)))
      .select(col("__b"), col("__off"))

    local.join(broadcast(offsets), Seq("__b"))
      .withColumn("__cum", col("__local") + col("__off"))
      .filter(col("__cum") <= budget)
      .select(col("__id").as(idCol), col("__tok").as(tokensCol),
        col("__cum").as("cum_tokens"))
  }

  /** X54 — deterministic per-class exact-k sample (class-balancing for
    * training sets): rank rows within each class by a seeded hash of
    * the id and keep the first `k` — every class contributes EXACTLY
    * min(k, |class|) rows, the draw is uniform over ids, reproducible
    * under reruns AND stable under corpus growth for surviving ids
    * (a row's hash never changes; it is displaced only when new ids
    * hash ahead of it). Same per-class window shape as [[domainCap]]:
    * parallel across classes, no global order. */
  def classSample(docs: DataFrame, k: Int, classCol: String,
      idCol: String, seed: Long = 42L,
      rankHash: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(k >= 1, "sample size must be positive")
    // engine-native draw is xxhash64 (8 B, codegen'd); pass `rankHash`
    // to substitute a cross-engine-portable hash (the x54 oracle face
    // uses md5 hex so DuckDB reproduces the identical draw)
    val h = rankHash.getOrElse(xxhash64(col(s"`$idCol`"), lit(seed)))
    val w = Window.partitionBy(col(s"`$classCol`"))
      .orderBy(h, col(s"`$idCol`"))
    docs.withColumn("draw", row_number().over(w))
      .filter(col("draw") <= k)
  }

  /** X71 — temperature-mix MATERIALIZATION: [[mixtureWeights]] says how
    * much of each source; this draws the actual corpus. `total` target
    * documents are apportioned per source by LARGEST REMAINDER over the
    * rounded weights (exact: quotas sum to `total`; floor everyone, then
    * the sources with the largest fractional parts absorb the deficit,
    * remainder ties broken by source name — fully deterministic and
    * SQL-reproducible arithmetic), then each source contributes its
    * quota by the X54 seeded-hash rank (reproducible, growth-stable
    * draws). A source smaller than its quota contributes everything it
    * has — the shortfall is NOT silently redistributed (that would
    * distort the other shares); the emitted `quota` column lets the
    * caller see and decide.
    *
    * Plan: the weight/quota relation is |sources| rows end to end
    * (broadcast back for the draw); the draw is per-source rank windows.
    * `rankHash` is the X54 portable-draw hook. */
  def mixtureDraw(docs: DataFrame, total: Long, sourceCol: String = "source",
      tokensCol: String = "n_tokens", alpha: Double = 0.3,
      idCol: String = "doc_id", seed: Long = 42L,
      rankHash: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(total >= 1, "target size must be positive")
    val exact = col("weight") * total
    val q0 = mixtureWeights(docs, sourceCol, tokensCol, alpha)
      .select(col("source"), col("weight"))
      .withColumn("base", floor(exact).cast("long"))
      .withColumn("rem", exact - col("base"))
    val byRem = Window.orderBy(col("rem").desc, col("source"))
    val whole = Window.partitionBy()
    // k-source relation: the global windows run over |sources| rows only
    val quotas = q0
      .withColumn("__rank", row_number().over(byRem))
      .withColumn("__deficit", lit(total) - sum(col("base")).over(whole))
      .withColumn("quota", col("base")
        + when(col("__rank") <= col("__deficit"), 1L).otherwise(0L))
      .select(col("source").as(sourceCol), col("quota"))
    val h = rankHash.getOrElse(xxhash64(col(s"`$idCol`"), lit(seed)))
    val dw = Window.partitionBy(col(s"`$sourceCol`"))
      .orderBy(h, col(s"`$idCol`"))
    docs.join(broadcast(quotas), Seq(sourceCol))
      .withColumn("draw", row_number().over(dw))
      .filter(col("draw") <= col("quota"))
  }

  /** X75 — distribution-matching resampler: draw the LARGEST subsample
    * whose bucket shares match a target distribution exactly — the
    * reshape pass behind "make the training mix 40% en / 30% fr /
    * 30% de" or "match this length histogram" when the raw corpus has
    * different proportions (the rejection-sampling recipe of
    * quality-pyramid / DoReMi-style pipelines, solved exactly instead of
    * probabilistically).
    *
    * Arithmetic (all SQL-reproducible, |buckets|-row relations):
    * normalize the target shares q_b; the scale ceiling is
    * T = floor(min_b n_b/q_b) — the largest total for which every bucket
    * can supply its share (the scarcest bucket binds; everyone else
    * downsamples to keep the ratio). T apportions to per-bucket quotas
    * by largest remainder (the [[mixtureDraw]] rule: floor everyone, the
    * largest fractional parts absorb the deficit, ties by bucket name),
    * each quota capped at n_b — a remainder bonus can exceed a binding
    * bucket's supply by 1; the ≤|buckets| shortfall is NOT silently
    * redistributed (the honesty contract of [[mixtureDraw]]: emitted
    * `quota` and `bucket_n` columns let the caller see and decide).
    * Rows then draw by the X54 seeded-hash rank within their bucket.
    *
    * Buckets OUTSIDE the target distribution are dropped (share 0); a
    * target bucket absent from the corpus forces T = 0 — an impossible
    * match is an empty result, not a silently skewed one. Screen targets
    * to observed buckets first if best-effort is wanted.
    *
    * Plan: one partial-agged count to |buckets| rows, window arithmetic
    * over that tiny relation, broadcast back, per-bucket rank windows —
    * no global sort, no driver loop. `rankHash` is the X54 portable-draw
    * hook (the x75 oracle face). */
  def matchDistribution(docs: DataFrame, targets: Seq[(String, Double)],
      bucketCol: String = "bucket", idCol: String = "doc_id",
      seed: Long = 42L,
      rankHash: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(targets.nonEmpty, "empty target distribution")
    require(targets.forall(_._2 > 0), "target shares must be positive")
    require(targets.map(_._1).distinct.size == targets.size,
      "duplicate bucket in target distribution")
    val z = targets.map(_._2).sum
    val spark = docs.sparkSession
    import spark.implicits._
    val q = targets.map { case (b, w) => (b, w / z) }.toDF("__b", "__q")
    val counts = docs.groupBy(col(s"`$bucketCol`").cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    // right join keeps target buckets missing from the corpus: their
    // n_b = 0 row drives T to 0 (the impossible-match contract above)
    val caps = counts.join(q, Seq("__b"), "right")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumn("__cap", col("__n").cast("double") / col("__q"))
    val whole = Window.partitionBy()
    val byRem = Window.orderBy(col("__rem").desc, col("__b"))
    // |buckets|-row relation end to end: the global windows are cheap.
    // floor(x + 1e-9) is the q44 boundary rule — n/q and q*T can land ON
    // an integer, where engine-order float rounding would pick the digit
    val quotas = caps
      .withColumn("__T",
        floor(min(col("__cap")).over(whole) + lit(1e-9)).cast("long"))
      .withColumn("__base",
        floor(col("__q") * col("__T") + lit(1e-9)).cast("long"))
      .withColumn("__rem",
        round(col("__q") * col("__T") - col("__base"), 9))
      .withColumn("__rank", row_number().over(byRem))
      .withColumn("__deficit", col("__T") - sum(col("__base")).over(whole))
      .withColumn("quota", least(
        col("__base")
          + when(col("__rank") <= col("__deficit"), 1L).otherwise(0L),
        col("__n")))
      .select(col("__b"), col("quota"), col("__n").as("bucket_n"))
    val h = rankHash.getOrElse(xxhash64(col(s"`$idCol`"), lit(seed)))
    val dw = Window.partitionBy(col(s"`$bucketCol`"))
      .orderBy(h, col(s"`$idCol`"))
    docs.join(broadcast(quotas),
        col(s"`$bucketCol`").cast("string") === col("__b"))
      .drop("__b")
      .withColumn("draw", row_number().over(dw))
      .filter(col("draw") <= col("quota"))
  }

  /** X60 — weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * A-ES): each row draws key = −ln(u)/w from a seeded per-id uniform u
    * and the k smallest keys win — provably equivalent to sequential
    * weighted draws without replacement. This is the sampling half of
    * [[mixtureWeights]]: temperature weights say how much of each source
    * to keep, A-ES actually draws the documents (w = the row's weight,
    * e.g. tokens × source weight).
    *
    * Scale shape: the draw is one row-local projection; selection is
    * either a per-stratum row_number window (strata partition the work)
    * or, global, a sort-limit that Spark plans as TakeOrderedAndProject —
    * per-partition top-k then a k-row driver merge, NEVER a global sort.
    * Rows with weight ≤ 0 are unsampleable by the A-ES contract and are
    * filtered out.
    *
    * Determinism contract (same as [[classSample]]): u comes from a hash
    * of the id and seed only, so a row's key never changes as the corpus
    * grows — re-runs reproduce, new data can displace but never re-draw.
    * Keys are ROUNDED to 9 decimals with an id tie-break before ranking
    * (the q44 rule): −ln and ÷ agree across engines only to the last
    * ulp, and the rounded compare makes the k-boundary bit-stable for
    * the cross-engine face.
    *
    * @param draw optional portable uniform u ∈ (0,1) (the x60 oracle
    *   face passes an md5-based u DuckDB reproduces bit-for-bit);
    *   None = engine-native xxhash64 draw. */
  def weightedSample(docs: DataFrame, k: Int, weightCol: String,
      idCol: String = "doc_id", strataCol: Option[String] = None,
      seed: Long = 42L,
      draw: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(k >= 1, "sample size must be positive")
    val twoTo52 = (1L << 52).toDouble
    val u = draw.getOrElse(
      (pmod(xxhash64(col(s"`$idCol`"), lit(seed)), lit(1L << 52))
        .cast("double") + 0.5) / twoTo52)
    val key = round(-log(u) / col(s"`$weightCol`"), 9)
    val keyed = docs.filter(col(s"`$weightCol`") > 0)
      .withColumn("__aes", key)
    strataCol match {
      case Some(sc) =>
        val w = Window.partitionBy(col(s"`$sc`"))
          .orderBy(col("__aes"), col(s"`$idCol`"))
        keyed.withColumn("draw", row_number().over(w))
          .filter(col("draw") <= k).drop("__aes")
      case None =>
        keyed.orderBy(col("__aes"), col(s"`$idCol`")).limit(k).drop("__aes")
    }
  }

  /** X51 — per-domain contribution cap (the CommonCrawl-curation rule
    * "no domain may dominate the corpus"): keep at most `n` documents
    * per `keyCol`, ranked by (`rankCol` DESC, `idCol`). One window per
    * domain — domains partition the work, so parallelism grows with the
    * corpus; no global ordering anywhere. */
  def domainCap(docs: DataFrame, n: Int, keyCol: String = "source",
      idCol: String = "doc_id", rankCol: String = "n_chars"): DataFrame = {
    require(n >= 1, "cap must be positive")
    val w = Window.partitionBy(col(s"`$keyCol`"))
      .orderBy(col(s"`$rankCol`").desc, col(s"`$idCol`"))
    docs.withColumn("rank_in_domain", row_number().over(w))
      .filter(col("rank_in_domain") <= n)
  }
}

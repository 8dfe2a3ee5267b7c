package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X43 — bigram language-model scoring (KenLM-style perplexity filter).
  *
  * The classic training-data quality gate: fit an n-gram LM on the corpus
  * (or a trusted reference corpus) and drop documents whose per-token
  * negative log-likelihood is an outlier — garbled text, boilerplate and
  * non-language bytes score far from the corpus mode. Reference analog:
  * the quality screens of `oedi_etl`'s curation stage generalized to the
  * n-gram LM filter used by large-scale LLM pipelines (CCNet/KenLM).
  *
  * Model: add-k smoothed bigram model over lowercased alpha tokens,
  * P(w2|w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V), with c(w1 ·) the count of
  * bigram contexts starting at w1 and V the distinct context vocabulary.
  * Document score = mean −ln P over its bigrams (per-token NLL; perplexity
  * is exp of it, monotone — we keep the NLL face because it is exactly
  * portable SQL).
  *
  * Plan shape, 100 TB reading: bigrams are built ROW-LOCALLY (slice +
  * arrays_zip — no shuffle, no self-join on position). Counts are two
  * hash aggregations with map-side partial combine; V is a scalar
  * broadcast. Scoring joins the exploded bigram relation against the
  * count tables on their natural keys — plain shuffle equi-joins whose
  * width is 16 bytes + the two token strings, with AQE free to pick
  * broadcast when a fitted model is small (trusted-corpus case). Nothing
  * materializes at driver; nothing is quadratic.
  */
object NgramLm {

  /** Lowercased alphabetic tokens (empty tokens dropped) — deliberately
    * the simplest tokenizer expressible identically in the DuckDB oracle. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), t => t =!= "")

  /** Row-local (w1, w2) bigram structs of `text`; empty array when the
    * document has fewer than two tokens. */
  def bigrams(text: Column): Column = {
    val ts = tokens(text)
    val n = size(ts)
    arrays_zip(
      slice(ts, lit(1), greatest(n - 1, lit(0))),
      slice(ts, lit(2), greatest(n - 1, lit(0))))
  }

  /** Exploded (id, w1, w2) bigram relation.
    *
    * The explicit isnotnull filter is semantically a no-op (the zipped
    * slices are equal-length arrays of non-null tokens) but it is what
    * lets ReuseExchange fire in [[selfScore]]: the scoring join INFERS
    * the same filter on its two branches, and the vocab aggregation —
    * which has no join to infer it from — otherwise canonicalizes to a
    * DIFFERENT subtree, so its (w1, w2) exchange re-ran the whole
    * scan + tokenize + partial-agg pipeline a third time (r16, plan
    * diff: 3 parquet scans → 2 + 1 ReusedExchange). */
  private def bigramRel(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(s"`$idCol`").as("__id"),
        explode(bigrams(col(s"`$textCol`"))).as("__bg"))
      .select(col("__id"),
        col("__bg").getField("0").as("__w1"),
        col("__bg").getField("1").as("__w2"))
      .filter(col("__w1").isNotNull && col("__w2").isNotNull)

  /** Fitted model: (bigram counts, context counts, context vocabulary).
    * Fit on a trusted corpus, score any other corpus against it. */
  case class Model(bigramCounts: DataFrame, contextCounts: DataFrame, vocab: DataFrame)

  /** Fit the bigram model on `docs`. The vocabulary scalar is derived
    * from the context-count relation (its row count IS |distinct w1|),
    * so fit, and any [[merge]] of fits, agree by construction. */
  def fit(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Model = {
    val bi = bigramRel(docs, idCol, textCol)
    // r16: derive the context counts from the bigram counts instead of a
    // second aggregation of the exploded relation — c(w1 ·) = Σ_w2
    // c(w1 w2) exactly, so the context scan re-tokenizes nothing and the
    // shuffle input is the already-reduced (w1, w2, c12) relation (guide
    // §2.3 "aggregate before you shuffle"). Values identical; the x43
    // oracle face pins it.
    val bc = bi.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c12"))
    val ctx = bc.groupBy(col("__w1")).agg(sum(col("__c12")).as("__c1"))
    Model(bigramCounts = bc, contextCounts = ctx,
      vocab = ctx.agg(count(lit(1)).as("__V")))
  }

  /** Mergeable-counts incremental fit (the X33/X38/X41 incremental
    * contract extended to the LM): count tables are additive, so a model
    * over `corpus₁ ∪ corpus₂` is the keyed SUM of the two models —
    * history is never rescanned when a batch arrives. Persist the two
    * count relations, fold each new batch's [[fit]] in. */
  def merge(a: Model, b: Model): Model = {
    val bc = a.bigramCounts.unionByName(b.bigramCounts)
      .groupBy(col("__w1"), col("__w2")).agg(sum(col("__c12")).as("__c12"))
    val ctx = a.contextCounts.unionByName(b.contextCounts)
      .groupBy(col("__w1")).agg(sum(col("__c1")).as("__c1"))
    Model(bc, ctx, ctx.agg(count(lit(1)).as("__V")))
  }

  /** Score `docs` against `model`: per-document mean −ln P(w2|w1) with
    * add-`k` smoothing. Documents with < 2 tokens (no bigrams) are absent
    * from the result — they carry no LM evidence. Out-of-model bigrams
    * fall back to the smoothed floor k / (c1 + k·V) (and k/(k·V) = 1/V
    * when the context itself is unseen). */
  def score(docs: DataFrame, model: Model,
      idCol: String = "doc_id", textCol: String = "text",
      k: Double = 0.5): DataFrame = {
    val bi = bigramRel(docs, idCol, textCol)
    bi
      .join(model.bigramCounts, Seq("__w1", "__w2"), "left")
      .join(model.contextCounts, Seq("__w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .withColumn("__p",
        (coalesce(col("__c12"), lit(0L)) + lit(k)) /
          (coalesce(col("__c1"), lit(0L)) + lit(k) * col("__V")))
      .groupBy(col("__id"))
      .agg(avg(-log(col("__p"))).as("__nll"), count(lit(1)).as("n_bigrams"))
      .select(col("__id").as(idCol), round(col("__nll"), 4).as("nll"),
        col("n_bigrams"))
  }

  /** Self-scored corpus (fit and score on the same data) — the usual
    * "drop the tail" quality pass.
    *
    * r16 shape: in the SELF-fit case every scored bigram exists in the
    * count table by construction, so the general [[score]]'s separate
    * context-count join (which must find c(w1 ·) even for unseen
    * (w1,w2)) is never exercised — the context count rides the bigram-
    * count relation through one w1-window instead. That removes a
    * row-scale shuffle: the exploded bigram relation was re-exchanged by
    * w1 for the ctx join; now it shuffles once, by (w1, w2), and the
    * extra exchange is over the REDUCED count relation (guide §2.3/2.4).
    * Identical arithmetic, identical values — x43/x50 oracle faces pin
    * it; out-of-model fallback semantics stay with [[score]], which is
    * unchanged for trusted-model scoring. */
  def selfScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bi = bigramRel(docs, idCol, textCol)
    val bc = bi.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c12"))
    val ann = bc.withColumn("__c1",
      sum(col("__c12")).over(Window.partitionBy(col("__w1"))))
    // The `__c12 >= 1` filter is a no-op (a group count is always ≥ 1)
    // whose only job is to STOP column pruning from dropping the count
    // out of this branch's partial aggregate: with it, the (w1, w2)
    // exchange under the vocab aggregation canonicalizes identically to
    // bc's (same inferred-null filters via [[bigramRel]], same aggregate
    // functions), so AQE reuses the already-computed shuffle stage
    // instead of re-running scan + tokenize + partial agg a third time
    // (r16: x43 2 scans + 1 reused exchange, was 3 scans; 1.00 → 0.74 s
    // at sf0.1).
    val vocab = bc.filter(col("__c12") >= 1)
      .agg(count_distinct(col("__w1")).as("__V"))
    bi
      .join(ann, Seq("__w1", "__w2"))
      .crossJoin(broadcast(vocab))
      .withColumn("__p",
        (coalesce(col("__c12"), lit(0L)) + lit(k)) /
          (coalesce(col("__c1"), lit(0L)) + lit(k) * col("__V")))
      .groupBy(col("__id"))
      .agg(avg(-log(col("__p"))).as("__nll"), count(lit(1)).as("n_bigrams"))
      .select(col("__id").as(idCol), round(col("__nll"), 4).as("nll"),
        col("n_bigrams"))
  }
}

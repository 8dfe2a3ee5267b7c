package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X76 — vocabulary coverage / out-of-vocabulary (OOV) reporting: given a
  * reference vocabulary (a tokenizer's word list, a frozen top-k from a
  * reference corpus), measure per-slice how much of the corpus the
  * vocabulary actually covers. The standard pre-tokenizer health check
  * before committing a 100 TB corpus to training: a slice with a high OOV
  * occurrence rate will fragment into byte-fallback tokens (inflating
  * sequence lengths and cost), and a DRIFTING rate across snapshots flags
  * incoming vocabulary shift before the loss curve does.
  *
  * Tokenizer: the X15 kernel (lower + non-alphanumeric split) — shared
  * with Contamination/Blocklist so every token-level screen in the engine
  * agrees on what a token is.
  *
  * Plan shapes:
  *  - [[build]]: one partial-agged token count + global top-k, which
  *    Spark plans as TakeOrderedAndProject (per-partition heap, k-row
  *    driver merge — no global sort). Rank ties break by token text, so
  *    the vocabulary is deterministic cross-engine.
  *  - [[oovReport]]: explode(tokens) → broadcast LEFT join against the
  *    k-row vocabulary → partial-agged per-slice counts. The explode
  *    multiplies rows but the partial aggregate collapses them map-side;
  *    nothing but (slice, 2 counters) crosses the wire.
  */
object Vocab {

  /** Lowercased alphanumeric tokens — the X15 kernel, shared verbatim. */
  private[ext] def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => length(t) > 0)

  /** Top-`k` tokens by occurrence count (count desc, token asc —
    * deterministic): (token, token_count, rank). */
  def build(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "vocabulary size must be positive")
    docs.select(explode(tokens(col(s"`$textCol`"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("token_count"))
      .orderBy(col("token_count").desc, col("token"))
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("token_count").desc, col("token"))))
  }

  /** Per-`groupCols`-slice coverage report against `vocab` (any DataFrame
    * with a `token` column — [[build]]'s output or an external word
    * list): (groupCols..., n_tokens, n_oov, oov_rate) counting token
    * OCCURRENCES (a repeated unknown word counts every time — occurrence
    * rate is what predicts byte-fallback inflation). Slices with zero
    * tokens emit no row (0/0 is undefined — the GROUP BY contract). */
  def oovReport(docs: DataFrame, textCol: String, vocab: DataFrame,
      groupCols: Seq[String], roundTo: Int = 4): DataFrame = {
    val gcols = groupCols.map(c => col(s"`$c`"))
    val v = vocab.select(col("token")).distinct()
      .withColumn("__known", lit(1L))
    docs.select(gcols :+ explode(tokens(col(s"`$textCol`"))).as("token"): _*)
      .join(broadcast(v), Seq("token"), "left")
      .groupBy(gcols: _*)
      .agg(
        count(lit(1)).as("n_tokens"),
        (count(lit(1)) - coalesce(sum(col("__known")), lit(0L))).as("n_oov"))
      .withColumn("oov_rate", round(
        col("n_oov").cast("double") / col("n_tokens") + lit(1e-9), roundTo))
  }
}

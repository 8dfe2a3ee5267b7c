package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X68 — incremental TOP-K maintenance: the leaderboard face of the
  * incremental family — "k best rows per key by score" kept current as
  * batches arrive, without ever rescanning history. The state IS the
  * answer (unlike X64's sample, which estimates): top-k of a union is
  * the top-k of the unioned top-k's, so [[update]] folds a delta against
  * the k-row-per-key state and any batch slicing yields the identical
  * result (the same exact-mergeability argument as X64's bottom-k
  * sample, with the score as the order key).
  *
  * Determinism: ties on score break by ascending `idCol` — a total
  * order, so the kept set is unique and replays/slicings reproduce
  * bit-for-bit. Plan shape: per-key row_number windows that Spark
  * executes as WindowGroupLimit (partial top-k BEFORE the shuffle —
  * each map task forwards at most k rows per key it has seen, so the
  * wire cost is bounded by k·keys·tasks, not the batch).
  */
object IncrementalTopK {

  private def topK(df: DataFrame, keys: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(c => col(s"`$c`")): _*)
      .orderBy(col(s"`$scoreCol`").desc, col(s"`$idCol`"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Bootstrap: the k highest-score rows per key. */
  def build(rows: DataFrame, keys: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    topK(rows, keys, scoreCol, idCol, k)
  }

  /** Fold a delta batch: union with the state, re-take top-k. History
    * beyond the state never participates — its k survivors per key ARE
    * the state. */
  def update(state: DataFrame, delta: DataFrame, keys: Seq[String],
      scoreCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    topK(state.unionByName(delta.select(state.columns.map(c =>
      col(s"`$c`")): _*)), keys, scoreCol, idCol, k)
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join with an event-time interval bound —
  * the attribution shape (impressions ⋈ clicks within a horizon). The
  * reference never joins two streams (SURVEY §2.7: bounded historical
  * data), but any event pipeline at scale needs this operator class, and
  * it is the one whose naive formulation is a state-size time bomb: an
  * unconstrained stream-stream equi-join must buffer EVERY past row on
  * both sides forever.
  *
  * What makes the state finite here (Spark's documented contract for
  * stream-stream joins): both inputs carry a watermark AND the join
  * condition bounds the two event times against each other, so rows older
  * than `watermark + horizon` are provably unmatchable and the state
  * store evicts them. Horizon and watermark are therefore the operator's
  * two explicit knobs, not tuning trivia.
  *
  * The SAME plan runs batch and streaming (parity-tested); the batch face
  * is oracle-checked against DuckDB (x8_stream_join), so the streaming
  * semantics are pinned by SQL, not just by self-consistency. Executed as
  * an equi-join on the key with the interval as a residual conjunct —
  * shuffle by key, never a cross join.
  *
  * Column-name contract: the two frames must not share column names other
  * than `key` (alias before calling, as any self-join requires); `key` is
  * emitted once.
  */
object StreamJoin {

  /** Left rows matched to right rows with the same key whose event time
    * falls in `[leftTime, leftTime + horizon]`.
    * @param joinType inner (default) or left_outer (unmatched left rows
    *   emit with nulls once the watermark passes their horizon). */
  def within(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, horizon: String = "1 hour",
      watermark: String = "2 hours", joinType: String = "inner"): DataFrame = {
    val l = if (left.isStreaming) left.withWatermark(leftTime, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTime, watermark) else right
    val cond = l(key) === r(key) &&
      r(rightTime) >= l(leftTime) &&
      r(rightTime) <= l(leftTime) + expr(s"INTERVAL $horizon")
    l.join(r, cond, joinType).drop(r(key))
  }
}

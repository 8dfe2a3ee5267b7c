package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization (SURVEY §2.7 extension: the session-window
  * operator class the reference never needed on bounded data, but any
  * event-stream ETL at scale does).
  *
  * Two implementations:
  *  - [[sessions]]: built-in `session_window` — gap-merged windows computed
  *    by Spark's session aggregation operator. Works identically over batch
  *    and streaming input (parity-tested), state evicted by the watermark.
  *  - [[runningTotals]]: `mapGroupsWithState` — the custom-state escape
  *    hatch for semantics session_window can't express (running per-key
  *    aggregates emitted every batch, custom timeout eviction). State is a
  *    tiny fixed-size record per key; event-time timeout eviction keeps it
  *    bounded on an unbounded key space.
  */
object Sessionize {

  /** Sessions per key: events closer than `gap` merge into one session.
    * Emits one row per closed session (append mode when streaming).
    * Deterministic output columns for parity testing. */
  def sessions(events: DataFrame, keyCol: String, timeCol: String,
      valueCol: String, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark(timeCol, watermark) else events
    src
      .groupBy(col(keyCol), session_window(col(timeCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("value_sum"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))
  }

  final case class KeyedEvent(key: Long, ts: Timestamp, value: Double)
  final case class RunningTotal(key: Long, n: Long, sum: Double)

  /** Cumulative (count, sum) per key, re-emitted on every batch that touches
    * the key (update mode). Keys idle longer than `idleEvictMs` of EVENT
    * time are evicted — their next event restarts from zero, the explicit
    * at-scale contract for state on an unbounded key space. Event-time
    * eviction (not wall-clock): state lifetime is data-defined, replays
    * deterministically, and needs no timeout-sweep batches — the same
    * watermark contract as [[StreamingDedup]].
    * Streaming-only (event-time timeouts need the watermark). */
  def runningTotals(events: Dataset[KeyedEvent],
      idleEvictMs: Long = 3600000L,
      watermarkDelay: String = "10 minutes"): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .mapGroupsWithState[RunningTotal, RunningTotal](
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, evs: Iterator[KeyedEvent], state: GroupState[RunningTotal]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(RunningTotal(key, 0L, 0.0))
            val (n, sum, maxTs) = evs.foldLeft((prev.n, prev.sum, Long.MinValue)) {
              case ((c, s, m), e) => (c + 1, s + e.value, math.max(m, e.ts.getTime))
            }
            val next = RunningTotal(key, n, sum)
            state.update(next)
            // evict once the watermark passes last-event-time + idle horizon
            state.setTimeoutTimestamp(
              math.max(maxTs + idleEvictMs,
                state.getCurrentWatermarkMs() + 1))
            next
          }
      }
  }

  /** Streaming face of [[runningTotals]] writing to a named in-memory sink
    * in update mode: drain everything currently available, then terminate. */
  def runningTotalsToMemory(events: Dataset[KeyedEvent], name: String,
      idleEvictMs: Long = 3600000L): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = runningTotals(events, idleEvictMs).writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}

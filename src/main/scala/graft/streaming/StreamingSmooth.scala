package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of X52 (`ext/Smooth`): per-key EWMA over an unbounded
  * stream via `flatMapGroupsWithState` — O(1) state per key (the running
  * smoothed value), each micro-batch's rows folded in event-time order.
  *
  * Contract (prefix-causal, the same one [[graft.ext.IncrementalDedup]]'s
  * near-dup face documents): rows WITHIN a batch are sorted by event
  * time before folding; ACROSS batches the recurrence consumes data in
  * arrival order, so an event later reordered behind the watermark
  * yields the ewma of the sequence as observed — replaying the same
  * batches reproduces it exactly. Keys idle past `idleEvictMs` of event
  * time are evicted (state on an unbounded key space must be bounded);
  * their next point restarts the recurrence.
  */
object StreamingSmooth {

  final case class Point(key: Long, ts: Timestamp, value: Double)
  final case class Smoothed(key: Long, ts: Timestamp, value: Double, ewma: Double)
  final case class St(smoothed: Double, lastEventMs: Long)

  def ewma(points: Dataset[Point], alpha: Double,
      watermarkDelay: String = "10 minutes",
      idleEvictMs: Long = 3600000L): Dataset[Smoothed] = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    import points.sparkSession.implicits._
    points
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Point], state: GroupState[St]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toIndexedSeq.sortBy(p => (p.ts.getTime, p.value))
            var st = state.getOption
            val out = sorted.map { p =>
              val y = st match {
                case Some(s) => alpha * p.value + (1 - alpha) * s.smoothed
                case None => p.value
              }
              st = Some(St(y, p.ts.getTime))
              Smoothed(key, p.ts, p.value, y)
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastEventMs + idleEvictMs)
            }
            out.iterator
          }
      }
  }
}

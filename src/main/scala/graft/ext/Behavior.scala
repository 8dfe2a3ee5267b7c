package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X45/X46 — behavioral analytics over the event stream: retention
  * cohorts and ordered funnel conversion. The reference's events pipeline
  * (queue → hourly rollup) stops at aggregation; these are the two query
  * shapes every product-analytics consumer of that rollup runs next.
  *
  * Plan shape, 100 TB reading: both operators reduce the event relation
  * to per-user scalars FIRST (one hash aggregation with map-side partial
  * combine, keyed by user), then work on the |users| relation — events
  * rows are never joined against events rows. Retention's second pass
  * joins events⋈cohorts on user_id: a shuffle equi-join where the
  * cohort side is |users| (broadcastable at dim scale, AQE decides).
  * Funnel's step chain is a cascade of per-user min-aggregations — k
  * passes for k steps, each a partial-agg groupBy, no window over the
  * raw stream.
  */
object Behavior {

  /** Weekly retention matrix: cohort week (week of the user's first
    * event) × week offset → distinct active users. */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val u = col(s"`$userCol`"); val ts = col(s"`$tsCol`")
    val cohorts = events.groupBy(u.as("__u"))
      .agg(date_trunc("week", min(ts)).as("cohort_week"))
    events.select(u.as("__u"), date_trunc("week", ts).as("__w"))
      .join(cohorts, Seq("__u"))
      .groupBy(col("cohort_week"),
        floor(datediff(col("__w"), col("cohort_week")) / 7).as("week_offset"))
      .agg(count_distinct(col("__u")).as("n_users"))
  }

  /** Ordered funnel: users who performed `steps(0)`, then `steps(1)`
    * strictly after it, … Returns one row per step with the count of
    * users who reached it. */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val u = col(s"`$userCol`"); val ts = col(s"`$tsCol`")
    val et = col(s"`$typeCol`")

    // reached(i): (__u, __t = first time step i completed respecting order)
    def level(r: DataFrame, idx: Int, name: String): DataFrame =
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("step_idx"), lit(name).as("step"), col("n_users"))

    var reached = events.filter(et === steps.head)
      .groupBy(u.as("__u")).agg(min(ts).as("__t"))
    var out = level(reached, 1, steps.head)
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      reached = events.filter(et === step).select(u.as("__u"), ts.as("__ts"))
        .join(reached, Seq("__u"))
        .filter(col("__ts") > col("__t"))
        .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
      out = out.unionByName(level(reached, i + 1, step))
    }
    out
  }

  /** X70 — event-type transition counts: (from_type, to_type, n) over
    * consecutive events per user ordered by time — the first-order
    * Markov/path-mining read (what do users do AFTER an error? which
    * step precedes purchase?). One lag window per user (users partition
    * the sort — parallelism grows with the user base, never a global
    * order) and one partial-aggregated pair groupBy; a user's first
    * event has no predecessor and contributes nothing. Tie order within
    * one timestamp is pinned by `idCol` so reruns reproduce. */
  def transitions(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$userCol`"))
      .orderBy(col(s"`$tsCol`"), col(s"`$idCol`"))
    events
      .withColumn("__prev", lag(col(s"`$typeCol`"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"),
        col(s"`$typeCol`").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }
}

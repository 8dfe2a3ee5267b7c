package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Behavior]] — retention cohorts and ordered funnels on a corpus whose
  * truth is known by construction; the events-table faces are
  * oracle-checked as x45_retention / x46_funnel. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention: cohort = week of first event, offsets count weeks") {
    // 2024-01-01 is a Monday. u1 first seen week 0, active weeks 0 and 2;
    // u2 first seen week 1, active week 1 only.
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")), // same week, distinct-counted once
      (1L, ts("2024-01-16 10:00:00")), // +2 weeks
      (2L, ts("2024-01-09 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.retention(events)
      .select(col("cohort_week").cast("date").cast("string"),
        col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("funnel: steps must occur strictly in order") {
    val events = Seq(
      // u1 completes view -> click -> purchase in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2 clicks BEFORE viewing: reaches step 1 only
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3 views and clicks, purchase precedes the click: stops at 2
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 09:00:00"), "purchase"),
      (3L, ts("2024-01-01 10:00:00"), "click"),
      // u4 never views
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(events, Seq("view", "click", "purchase"))
      .select(col("step_idx"), col("n_users"))
      .as[(Int, Long)].collect().toMap
    assert(out === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel: equal timestamps do not satisfy 'strictly after'") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(events, Seq("view", "click"))
      .select(col("step_idx"), col("n_users"))
      .as[(Int, Long)].collect().toMap
    assert(out === Map(1 -> 1L, 2 -> 0L))
  }

  test("transitions: per-user consecutive pairs, first event contributes nothing") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(m: Int) = new java.sql.Timestamp(t0 + m * 60000L)
    // user 1: view -> click -> view ; user 2: view (alone) — no pair
    // crosses users, a lone event yields nothing
    val events = Seq(
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(1), "click"),
      (3L, 1L, ts(2), "view"), (4L, 2L, ts(0), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Behavior.transitions(events)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("view", "click", 1L), ("click", "view", 1L)))
    // equal timestamps: order pinned by event_id
    val tied = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(0), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(Behavior.transitions(tied)
      .as[(String, String, Long)].collect().toSeq === Seq(("a", "b", 1L)))
  }
}

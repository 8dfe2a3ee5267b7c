package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val t0 = ts("2020-01-01 00:00:00")
  private val t1 = ts("2021-06-01 00:00:00")

  private lazy val history = Seq(
    // key 1: already has one closed + one open row
    (1L, "a", Some(10.0), t0, Some(ts("2020-06-01 00:00:00"))),
    (1L, "a2", Some(11.0), ts("2020-06-01 00:00:00"), None),
    (2L, "b", Some(20.0), t0, None), // will change
    (3L, "c", Some(30.0), t0, None), // will vanish (delete)
    (4L, "d", None, t0, None)        // NULL attr, unchanged
  ).toDF("k", "s", "v", "valid_from", "valid_to")

  private lazy val snapshot = Seq(
    (1L, "a2", Some(11.0)), // unchanged
    (2L, "B", Some(21.0)),  // changed
    (4L, "d", None),        // unchanged incl. NULL attr
    (5L, "e", Some(50.0))   // new key
  ).toDF("k", "s", "v")

  private def run() = Scd2(history, snapshot, Seq("k"), lit(t1))
    .orderBy("k", "valid_from")
    .as[(Long, String, Option[Double], Timestamp, Option[Timestamp])]
    .collect().toSeq

  test("change closes the open row and opens a new one") {
    val rows = run().filter(_._1 == 2L)
    assert(rows === Seq(
      (2L, "b", Some(20.0), t0, Some(t1)),
      (2L, "B", Some(21.0), t1, None)))
  }

  test("delete closes; new key opens; unchanged passes through") {
    val byKey = run().groupBy(_._1)
    assert(byKey(3L) === Seq((3L, "c", Some(30.0), t0, Some(t1))))
    assert(byKey(5L) === Seq((5L, "e", Some(50.0), t1, None)))
    assert(byKey(1L) === Seq(
      (1L, "a", Some(10.0), t0, Some(ts("2020-06-01 00:00:00"))),
      (1L, "a2", Some(11.0), ts("2020-06-01 00:00:00"), None)))
  }

  test("NULL attributes compare as equal (no phantom change)") {
    val rows = run().filter(_._1 == 4L)
    assert(rows === Seq((4L, "d", None, t0, None)))
  }

  test("idempotence: applying the same snapshot twice is a no-op") {
    val once = Scd2(history, snapshot, Seq("k"), lit(t1))
    val twice = Scd2(once, snapshot, Seq("k"), lit(ts("2022-01-01 00:00:00")))
    assert(twice.count() === once.count())
    assert(twice.exceptAll(once).count() === 0)
  }

  test("invariant: at most one open row per key after apply") {
    val open = Scd2(history, snapshot, Seq("k"), lit(t1))
      .filter(col("valid_to").isNull)
      .groupBy("k").count().filter(col("count") > 1)
    assert(open.count() === 0)
  }
}

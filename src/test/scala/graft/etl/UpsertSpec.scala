package graft.etl

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "s", "v")

  test("matched keys are replaced, new keys inserted, rest pass through") {
    val changes = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val out = Upsert.upsert(base, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("empty change set is identity; change-only keys on empty base insert") {
    val empty = base.limit(0)
    assert(Upsert.upsert(base, empty, Seq("k")).count() === 3)
    assert(Upsert.upsert(empty, base, Seq("k")).count() === 3)
  }

  test("composite keys match on the full tuple") {
    val b2 = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "s", "v")
    val c2 = Seq((1L, "y", 9.0)).toDF("k", "s", "v")
    val out = Upsert.upsert(b2, c2, Seq("k", "s"))
      .orderBy("k", "s").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "x", 1.0), (1L, "y", 9.0)))
  }

  test("versioned: stale changes lose, newer and equal versions apply") {
    val baseV = Seq((1L, "a", 5L), (2L, "b", 5L), (3L, "c", 5L)).toDF("k", "s", "v")
    val changes = Seq(
      (1L, "stale", 4L),  // older version: rejected
      (2L, "newer", 6L),  // newer: applied
      (3L, "same", 5L),   // equal: applied (idempotent re-delivery)
      (4L, "new", 1L))    // unseen key: inserted
      .toDF("k", "s", "v")
    val out = Upsert.upsertVersioned(baseV, changes, Seq("k"), "v")
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "a", 5L), (2L, "newer", 6L), (3L, "same", 5L), (4L, "new", 1L)))
  }

  test("versioned: fold order does not matter") {
    val newer = Seq((1L, "v9", 9L)).toDF("k", "s", "v")
    val older = Seq((1L, "v2", 2L)).toDF("k", "s", "v")
    def fold(changes: Seq[org.apache.spark.sql.DataFrame]) =
      changes.foldLeft(Seq((1L, "v5", 5L)).toDF("k", "s", "v")) {
        (acc, c) => Upsert.upsertVersioned(acc, c, Seq("k"), "v")
      }.as[(Long, String, Long)].collect().toSeq
    assert(fold(Seq(newer, older)) === fold(Seq(older, newer)))
    assert(fold(Seq(newer, older)) === Seq((1L, "v9", 9L)))
  }

  test("column order differences are reconciled by name") {
    val changes = Seq(("zz", 2L, 7.0)).toDF("s", "k", "v")
    val out = Upsert.upsert(base, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "zz", 7.0), (3L, "c", 30.0)))
  }
}

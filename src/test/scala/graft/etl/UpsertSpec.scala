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

  test("column order differences are reconciled by name") {
    val changes = Seq(("zz", 2L, 7.0)).toDF("s", "k", "v")
    val out = Upsert.upsert(base, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 10.0), (2L, "zz", 7.0), (3L, "c", 30.0)))
  }
}

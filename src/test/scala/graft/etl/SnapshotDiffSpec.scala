package graft.etl

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val before = Seq(
    (1L, "a", Some(1.0)), (2L, "b", Some(2.0)),
    (3L, "c", Some(3.0)), (4L, "d", None))
    .toDF("k", "s", "v")
  private lazy val after = Seq(
    (1L, "a", Some(1.0)),   // unchanged
    (2L, "B", Some(2.0)),   // changed
    (4L, "d", None),        // unchanged incl NULL attr
    (5L, "e", Some(5.0)))   // added; 3 removed
    .toDF("k", "s", "v")

  test("hash mode and exact mode agree on added/removed/changed") {
    for (exact <- Seq(true, false)) {
      val got = SnapshotDiff.diff(before, after, Seq("k"), exact)
        .as[(Long, String)].collect().toSet
      assert(got === Set((2L, "changed"), (3L, "removed"), (5L, "added")),
        s"exact=$exact")
    }
  }

  test("NULL attribute is not a phantom change; identical snapshots diff empty") {
    assert(SnapshotDiff.diff(before, before, Seq("k")).count() === 0)
  }

  test("hash mode shuffles only (key, hash, flag): content below the join") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val qe = SnapshotDiff.diff(before, after, Seq("k")).queryExecution
    val joins = qe.optimizedPlan.collect { case j: Join => j }
    assert(joins.size === 1)
    // each join input is exactly (k, __c, flag) — the wide attr columns
    // were folded into the 8-byte hash below the join, so the exchanges
    // feeding it carry 3 narrow columns, never the row
    joins.head.children.foreach { c =>
      assert(c.output.map(_.name).toSet.subsetOf(Set("k", "__c", "__b", "__a")),
        c.output.map(_.name).mkString(","))
      assert(c.output.size === 3)
    }
  }

  test("summary counts") {
    val got = SnapshotDiff.summary(before, after, Seq("k"))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("added", 1L), ("changed", 1L), ("removed", 1L)))
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Survivorship]] — latest-non-null golden record. Cross-engine face
  * (arg_max with null-screened scalar order) is x66_golden. */
class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  private lazy val history = Seq(
    // key 1: name set early then never again; score updated twice,
    // later update null (must NOT erase)
    (1L, 10L, Some("alice"), Some(1.0)),
    (1L, 20L, None, Some(2.0)),
    (1L, 30L, None, None),
    // key 2: everything only in the last version
    (2L, 10L, None, None),
    (2L, 20L, Some("bob"), Some(9.0)),
    // key 3: all null history -> null fields, but the key survives
    (3L, 10L, None, None))
    .toDF("k", "v", "name", "score")

  test("per-field latest non-null wins; null never erases; all-null key survives") {
    val got = Survivorship
      .goldenRecord(history, Seq("k"), "v", Seq("name", "score"))
      .orderBy("k")
      .select("k", "name", "score", "n_versions", "last_order")
      .as[(Long, Option[String], Option[Double], Long, Long)]
      .collect().toSeq
    assert(got === Seq(
      (1L, Some("alice"), Some(2.0), 3L, 30L),
      (2L, Some("bob"), Some(9.0), 2L, 20L),
      (3L, None, None, 1L, 10L)))
  }

  test("idempotent: golden of golden is golden") {
    val g = Survivorship
      .goldenRecord(history, Seq("k"), "v", Seq("name", "score"))
      .withColumnRenamed("last_order", "v2")
    val gg = Survivorship
      .goldenRecord(g, Seq("k"), "v2", Seq("name", "score"))
      .select("k", "name", "score").orderBy("k").collect().toSeq
    assert(gg === g.select("k", "name", "score").orderBy("k").collect().toSeq)
  }

  test("single hash aggregation: no window, no join in the plan") {
    val qe = Survivorship
      .goldenRecord(history, Seq("k"), "v", Seq("name", "score"))
      .queryExecution.executedPlan.toString
    assert(!qe.contains("Window") && !qe.contains("Join"))
    assert(qe.contains("partial_"))
  }
}

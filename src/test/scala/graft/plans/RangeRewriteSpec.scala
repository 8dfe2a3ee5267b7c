package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

import graft.SparkSpec

/** [[RangeJoinRewrite]]: the conf-gated optimizer rule that turns
  * equi-key-less range joins into binned equi-joins. Every test compares
  * the rewritten result against the SAME query with the rule inert (the
  * BNLJ plan is the semantics oracle), and the plan tests assert the
  * nested-loop join is actually gone. */
class RangeRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1, 0.5), (2, 1.0), (3, 7.25), (4, 10.0), (5, 99.9), (6, -3.0))
    .toDF("pid", "v")

  private def intervals = Seq(
    (10, 0.0, 1.0), (11, 1.0, 8.0), (12, 9.5, 10.0), (13, -5.0, -1.0),
    (14, 50.0, 50.0))   // empty [50,50)
    .toDF("iid", "lo", "hi")

  private def withRule[A](width: Double)(f: => A): A = {
    spark.conf.set(RangeJoinRewrite.BinWidthKey, width.toString)
    try f finally spark.conf.unset(RangeJoinRewrite.BinWidthKey)
  }

  private def rows(df: DataFrame): Set[(Int, Int)] =
    df.select("pid", "iid").as[(Int, Int)].collect().toSet

  // pre-AQE plan: the executedPlan is an AdaptiveSparkPlanExec wrapper that
  // hides its subtree from children-based traversal
  private def hasBnlj(df: DataFrame): Boolean =
    df.queryExecution.sparkPlan.exists(p =>
      p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])

  test("half-open [lo, hi): same rows as the nested-loop plan, no BNLJ") {
    points.createOrReplaceTempView("p")
    intervals.createOrReplaceTempView("i")
    val sql = "SELECT pid, iid FROM p JOIN i ON v >= lo AND v < hi"
    val naive = spark.sql(sql)
    assert(hasBnlj(naive), "control query should nested-loop")
    val expected = rows(naive)
    withRule(2.0) {
      val opt = spark.sql(sql)
      assert(!hasBnlj(opt), "rewritten plan must not nested-loop")
      assert(rows(opt) === expected)
      assert(expected === Set((1, 10), (2, 11), (3, 11), (6, 13)),
        "fixture sanity: boundary v=1.0 excluded from [0,1), included in [1,8)")
    }
  }

  test("bound-variant matrix: strictness only changes the residual") {
    points.createOrReplaceTempView("p")
    intervals.createOrReplaceTempView("i")
    val variants = Seq(
      "v > lo AND v <= hi",
      "v >= lo AND v <= hi",
      "v > lo AND v < hi",
      "v BETWEEN lo AND hi",
      "lo <= v AND hi > v")   // mirrored operand order
    for (pred <- variants) {
      val sql = s"SELECT pid, iid FROM p JOIN i ON $pred"
      val expected = rows(spark.sql(sql))
      withRule(2.0) {
        val opt = spark.sql(sql)
        assert(!hasBnlj(opt), s"still nested-loops: $pred")
        assert(rows(opt) === expected, s"diverged: $pred")
      }
    }
  }

  test("null points, null bounds, inverted intervals match nothing") {
    val p = Seq((1, Some(5.0)), (2, None)).toDF("pid", "v")
    val i = Seq(
      (10, Some(0.0), Some(10.0)),    // matches v=5
      (11, None, Some(10.0)),         // null lo
      (12, Some(0.0), None),          // null hi
      (13, Some(9.0), Some(1.0)))     // inverted
      .toDF("iid", "lo", "hi")
    p.createOrReplaceTempView("pn")
    i.createOrReplaceTempView("in_")
    val sql = "SELECT pid, iid FROM pn JOIN in_ ON v >= lo AND v < hi"
    val expected = rows(spark.sql(sql))
    assert(expected === Set((1, 10)))
    withRule(1.0) {
      val opt = spark.sql(sql)
      assert(!hasBnlj(opt))
      assert(rows(opt) === expected)
    }
  }

  test("interval side on the left rewrites too") {
    points.createOrReplaceTempView("p")
    intervals.createOrReplaceTempView("i")
    val sql = "SELECT pid, iid FROM i JOIN p ON v >= lo AND v < hi"
    val expected = rows(spark.sql(sql))
    withRule(2.0) {
      val opt = spark.sql(sql)
      assert(!hasBnlj(opt))
      assert(rows(opt) === expected)
    }
  }

  test("wide intervals spanning many bins stay correct") {
    points.createOrReplaceTempView("p")
    intervals.createOrReplaceTempView("i")
    val sql = "SELECT pid, iid FROM p JOIN i ON v >= lo AND v < hi"
    val expected = rows(spark.sql(sql))
    withRule(0.01) {   // [1,8) explodes to 700 bins — correctness unchanged
      assert(rows(spark.sql(sql)) === expected)
    }
  }

  test("joins with an equi-conjunct are left alone") {
    val p = Seq((1, "k1", 5.0)).toDF("pid", "k", "v")
    val i = Seq((10, "k1", 0.0, 10.0)).toDF("iid", "k2", "lo", "hi")
    p.createOrReplaceTempView("pk")
    i.createOrReplaceTempView("ik")
    withRule(1.0) {
      val opt = spark.sql(
        "SELECT pid, iid FROM pk JOIN ik ON k = k2 AND v >= lo AND v < hi")
      val plan = opt.queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"), s"should not rewrite:\n$plan")
      assert(rows(opt) === Set((1, 10)))
    }
  }

  test("rule is inert without the conf") {
    points.createOrReplaceTempView("p")
    intervals.createOrReplaceTempView("i")
    val df = spark.sql("SELECT pid, iid FROM p JOIN i ON v >= lo AND v < hi")
    assert(!df.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
  }

  test("extension-free semantics preserved on a random fixture") {
    // 300 random points × 60 random intervals, multiple widths — the
    // rewritten join must be row-identical to the nested-loop evaluation
    val rnd = new scala.util.Random(42)
    val p = (1 to 300).map(i => (i, rnd.nextDouble() * 100 - 20)).toDF("pid", "v")
    val i = (1 to 60).map { j =>
      val a = rnd.nextDouble() * 100 - 20
      (j, a, a + rnd.nextDouble() * 15)
    }.toDF("iid", "lo", "hi")
    p.createOrReplaceTempView("pr")
    i.createOrReplaceTempView("ir")
    val sql = "SELECT pid, iid FROM pr JOIN ir ON v >= lo AND v < hi"
    val expected = rows(spark.sql(sql))
    assert(expected.nonEmpty)
    for (w <- Seq(0.5, 3.0, 40.0)) withRule(w) {
      assert(rows(spark.sql(sql)) === expected, s"width $w")
    }
  }
}

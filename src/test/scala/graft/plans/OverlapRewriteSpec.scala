package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

import graft.SparkSpec

/** [[OverlapJoinRewrite]]: the conf-gated rule that turns interval-overlap
  * joins into binned equi-joins. Like RangeRewriteSpec, every test uses
  * the SAME query with the rule inert as the semantics oracle (the BNLJ
  * plan), and plan tests assert the nested-loop join is gone. The
  * degenerate fixtures (inverted intervals, nulls) are the heart of the
  * spec — the clamped-bin construction exists exactly for them. */
class OverlapRewriteSpec extends SparkSpec {
  import spark.implicits._

  // [lo, hi] intervals on both sides; 23 is inverted ON PURPOSE: it can
  // still match (23.lo=9 <= b.hi and b.lo <= 23.hi=2 holds for b=[0,10])
  private def as = Seq(
    (1, 0.0, 2.0), (2, 1.5, 6.0), (3, 50.0, 60.0), (4, -9.0, -8.0),
    (5, 40.0, 70.0), (23, 9.0, 2.0))
    .toDF("aid", "alo", "ahi")

  private def bs = Seq(
    (10, 0.0, 10.0), (11, 5.9, 7.0), (12, 100.0, 101.0), (13, -8.5, -1.0),
    (14, 61.0, 49.0))   // inverted on the right side too
    .toDF("bid", "blo", "bhi")

  private def withRule[A](width: Double)(f: => A): A = {
    spark.conf.set(OverlapJoinRewrite.BinWidthKey, width.toString)
    try f finally spark.conf.unset(OverlapJoinRewrite.BinWidthKey)
  }

  private def rows(df: DataFrame): Set[(Int, Int)] =
    df.select("aid", "bid").as[(Int, Int)].collect().toSet

  private def hasBnlj(df: DataFrame): Boolean =
    df.queryExecution.sparkPlan.exists(p =>
      p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])

  private val overlapSql =
    "SELECT aid, bid FROM a JOIN b ON alo <= bhi AND blo <= ahi"

  test("overlap join: same rows as the nested-loop plan, no BNLJ") {
    as.createOrReplaceTempView("a")
    bs.createOrReplaceTempView("b")
    val naive = spark.sql(overlapSql)
    assert(hasBnlj(naive), "control query should nested-loop")
    val expected = rows(naive)
    // fixture sanity: the inverted intervals DO match things under the
    // raw predicate — the rewrite must keep them
    assert(expected.contains((23, 10)), "inverted left interval must match")
    assert(expected.contains((5, 14)), "inverted right interval must match")
    withRule(4.0) {
      val opt = spark.sql(overlapSql)
      assert(!hasBnlj(opt), "rewritten plan must not nested-loop")
      assert(rows(opt) === expected)
    }
  }

  test("strictness variants only change the residual") {
    as.createOrReplaceTempView("a")
    bs.createOrReplaceTempView("b")
    val variants = Seq(
      "alo < bhi AND blo < ahi",
      "alo <= bhi AND blo < ahi",
      "bhi >= alo AND ahi > blo")   // mirrored operand order
    for (pred <- variants) {
      val sql = s"SELECT aid, bid FROM a JOIN b ON $pred"
      val expected = rows(spark.sql(sql))
      withRule(4.0) {
        val opt = spark.sql(sql)
        assert(!hasBnlj(opt), s"still nested-loops: $pred")
        assert(rows(opt) === expected, s"diverged: $pred")
      }
    }
  }

  test("pairs spanning many shared bins are emitted exactly once") {
    as.createOrReplaceTempView("a")
    bs.createOrReplaceTempView("b")
    // tiny bins: [1.5,6] vs [0,10] share ~45 bins at w=0.1 — the
    // first-shared-bin residual must dedup; count multiplicity not sets
    val sql = "SELECT aid, bid FROM a JOIN b ON alo <= bhi AND blo <= ahi"
    val expected = spark.sql(sql).groupBy("aid", "bid").count()
      .as[(Int, Int, Long)].collect().toSet
    withRule(0.1) {
      val got = spark.sql(sql).groupBy("aid", "bid").count()
        .as[(Int, Int, Long)].collect().toSet
      assert(got === expected)
    }
  }

  test("null bounds match nothing, like the raw predicate") {
    val a = Seq((1, Some(0.0), Some(5.0)), (2, None, Some(5.0)),
      (3, Some(0.0), None)).toDF("aid", "alo", "ahi")
    val b = Seq((10, Some(1.0), Some(2.0)), (11, None, None))
      .toDF("bid", "blo", "bhi")
    a.createOrReplaceTempView("a")
    b.createOrReplaceTempView("b")
    val expected = rows(spark.sql(overlapSql))
    // row 3 (null ahi): alo<=bhi fine but blo<=ahi is null ⇒ no match
    assert(expected === Set((1, 10)))
    withRule(1.0) {
      val opt = spark.sql(overlapSql)
      assert(!hasBnlj(opt))
      assert(rows(opt) === expected)
    }
  }

  test("point-in-interval degenerates correctly (la == lh)") {
    val p = Seq((1, 3.0), (2, 99.0)).toDF("pid", "v")
    bs.createOrReplaceTempView("b")
    p.createOrReplaceTempView("p")
    val sql = "SELECT pid, bid FROM p JOIN b ON v <= bhi AND blo <= v"
    val expected = p.as[(Int, Double)].collect().flatMap { case (pid, v) =>
      Seq((10, 0.0, 10.0), (11, 5.9, 7.0), (12, 100.0, 101.0),
        (13, -8.5, -1.0), (14, 61.0, 49.0))
        .collect { case (bid, lo, hi) if v <= hi && lo <= v => (pid, bid) }
    }.toSet
    withRule(2.0) {
      val opt = spark.sql(sql)
      assert(!hasBnlj(opt))
      assert(opt.select("pid", "bid").as[(Int, Int)].collect().toSet === expected)
    }
  }

  test("joins with an equi-conjunct are left alone") {
    val a = Seq((1, "k", 0.0, 5.0)).toDF("aid", "ak", "alo", "ahi")
    val b = Seq((10, "k", 1.0, 2.0)).toDF("bid", "bk", "blo", "bhi")
    a.createOrReplaceTempView("ak_")
    b.createOrReplaceTempView("bk_")
    withRule(1.0) {
      val opt = spark.sql(
        "SELECT aid, bid FROM ak_ JOIN bk_ ON ak = bk AND alo <= bhi AND blo <= ahi")
      assert(!opt.queryExecution.optimizedPlan.toString.contains("__graft_obin"))
      assert(rows(opt) === Set((1, 10)))
    }
  }

  test("rule is inert without the conf") {
    as.createOrReplaceTempView("a")
    bs.createOrReplaceTempView("b")
    val df = spark.sql(overlapSql)
    assert(!df.queryExecution.optimizedPlan.toString.contains("__graft_obin"))
  }

  test("random fixture with inverted and touching intervals, many widths") {
    val rnd = new scala.util.Random(7)
    // ~10% inverted on each side; bounds in [-20, 80]
    def mk(n: Int) = (1 to n).map { i =>
      val lo = rnd.nextDouble() * 100 - 20
      val len = rnd.nextDouble() * 12 - 1.2   // negative ⇒ inverted
      (i, lo, lo + len)
    }
    val a = mk(250).toDF("aid", "alo", "ahi")
    val b = mk(80).toDF("bid", "blo", "bhi")
    a.createOrReplaceTempView("a")
    b.createOrReplaceTempView("b")
    val expected = rows(spark.sql(overlapSql))
    assert(expected.nonEmpty)
    for (w <- Seq(0.3, 5.0, 75.0)) withRule(w) {
      assert(rows(spark.sql(overlapSql)) === expected, s"width $w")
    }
  }
}

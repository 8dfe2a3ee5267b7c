package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[PreAggExpandRewrite]]: partial-aggregate-below-Expand for rollup /
  * cube / grouping sets. Every semantics test compares the rewritten
  * result against the SAME query with the rule disabled (Spark's stock
  * Expand-first plan is the oracle); plan tests assert the Expand really
  * does read from an Aggregate, and the guard tests assert ineligible
  * shapes are left alone. */
class PreAggExpandSpec extends SparkSpec {
  import spark.implicits._

  // randomized-but-seeded input: nulls in BOTH grouping columns (the gid
  // disambiguation case), duplicate keys (so pre-agg genuinely collapses),
  // negative + null measures
  private def df: DataFrame = {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      val g1 = if (rnd.nextInt(10) == 0) None else Some("g" + rnd.nextInt(4))
      val g2 = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(3))
      val v = if (rnd.nextInt(20) == 0) None else Some(rnd.nextDouble() * 20 - 10)
      (g1, g2, v, i.toLong)
    }
    rows.toDF("g1", "g2", "v", "n")
  }

  private def disabled[A](f: => A): A = {
    spark.conf.set(PreAggExpandRewrite.EnabledKey, "false")
    try f finally spark.conf.unset(PreAggExpandRewrite.EnabledKey)
  }

  private def expandReadsFromAggregate(q: DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collectFirst {
      case Expand(_, _, child) => child.isInstanceOf[Aggregate]
    }.getOrElse(false)

  private def sortedRows(q: DataFrame): Seq[String] =
    q.collect().map(_.toSeq.map {
      case d: Double => f"$d%.9f"
      case other     => String.valueOf(other)
    }.mkString("|")).sorted.toSeq

  private def checkSame(build: => DataFrame): Unit = {
    val expected = disabled {
      val plain = build
      assert(!expandReadsFromAggregate(plain), "control must be Expand-first")
      sortedRows(plain)
    }
    val opt = build
    assert(expandReadsFromAggregate(opt), "rewrite should have fired")
    assert(opt.schema === disabled(build).schema)
    assert(sortedRows(opt) === expected)
  }

  test("cube count/sum/min/max ≡ stock plan (nulls, dup keys)") {
    checkSame(df.cube($"g1", $"g2").agg(
      count(lit(1)).as("cnt"), count($"v").as("cnt_v"),
      sum($"v").as("sv"), min($"v").as("mn"), max($"n").as("mx")))
  }

  test("rollup ≡ stock plan") {
    checkSame(df.rollup($"g1", $"g2").agg(
      count(lit(1)).as("cnt"), sum($"n").as("sn")))
  }

  test("grouping sets with grouping()/grouping_id() ≡ stock plan") {
    checkSame(df.groupingSets(
        Seq(Seq($"g1"), Seq($"g2"), Seq()), $"g1", $"g2")
      .agg(count(lit(1)).as("cnt"),
        grouping($"g1").cast("long").as("gg1"),
        grouping_id().as("gid"),
        sum($"v").as("sv")))
  }

  test("grouping by an expression (not a bare column) ≡ stock plan") {
    checkSame(df.cube(($"n" % 5).as("nb"), $"g2").agg(
      count(lit(1)).as("cnt"), max($"v").as("mx")))
  }

  test("SQL GROUPING SETS with repeated column across sets ≡ stock plan") {
    df.createOrReplaceTempView("pae_t")
    checkSame(spark.sql(
      """SELECT g1, g2, COUNT(*) AS cnt, SUM(v) AS sv
        | FROM pae_t
        | GROUP BY GROUPING SETS ((g1, g2), (g1))""".stripMargin))
  }

  test("guard: DISTINCT aggregate is not rewritten") {
    val q = df.cube($"g1").agg(countDistinct($"g2").as("cd"))
    assert(!expandReadsFromAggregate(q))
    assert(sortedRows(q) === disabled(sortedRows(df.cube($"g1")
      .agg(countDistinct($"g2").as("cd")))))
  }

  test("cube avg (double with nulls) ≡ stock plan") {
    checkSame(df.cube($"g1", $"g2").agg(
      avg($"v").as("av"), count(lit(1)).as("cnt")))
  }

  test("rollup avg over integral input (long→double) ≡ stock plan") {
    checkSame(df.rollup($"g1").agg(
      avg($"n").as("an"), sum($"n").as("sn"), avg($"v").as("av")))
  }

  test("avg of an all-null group stays NULL through the decomposition") {
    // group "dead" carries ONLY null measures: Σcount=0 must merge to
    // NULL (LEGACY division), not a divide-by-zero error or 0
    val d = Seq(("dead", None: Option[Double]), ("dead", None),
      ("live", Some(2.0)), ("live", Some(4.0))).toDF("g", "v")
    val build = d.cube($"g").agg(avg($"v").as("av"), count($"v").as("cv"))
    assert(expandReadsFromAggregate(build))
    val got = build.collect().map(r =>
      (r.getAs[String]("g"), Option(r.getAs[Any]("av")))).toMap
    assert(got(("dead")) === None)
    assert(got(("live")) === Some(3.0))
    checkSame(d.cube($"g").agg(avg($"v").as("av")))
  }

  test("guard: decimal AVG is not rewritten") {
    val d = df.withColumn("dec", $"n".cast("decimal(10,2)"))
    val q = d.cube($"g1").agg(avg($"dec").as("ad"))
    assert(!expandReadsFromAggregate(q))
  }

  test("guard: aggregate over a nulled grouping copy is not rewritten") {
    // SUM over a grouping column's per-projection (nulled) copy would be
    // projection-dependent — the rule must refuse
    df.createOrReplaceTempView("pae_t2")
    val q = spark.sql(
      "SELECT g2, SUM(g2) AS sg FROM pae_t2 GROUP BY CUBE(g2)")
    val expected = disabled(sortedRows(spark.sql(
      "SELECT g2, SUM(g2) AS sg FROM pae_t2 GROUP BY CUBE(g2)")))
    assert(sortedRows(q) === expected)
  }

  test("guard: decimal SUM is not rewritten (re-sum would widen precision)") {
    val d = df.withColumn("dec", $"n".cast("decimal(10,2)"))
    val q = d.cube($"g1").agg(sum($"dec").as("sd"))
    assert(!expandReadsFromAggregate(q))
  }

  test("count schema stays non-nullable through the COALESCE merge") {
    val q = df.cube($"g1").agg(count(lit(1)).as("cnt"))
    assert(expandReadsFromAggregate(q))
    assert(!q.schema("cnt").nullable)
  }

  test("conf off: rule inert") {
    disabled {
      val q = df.cube($"g1", $"g2").agg(count(lit(1)).as("cnt"))
      assert(!expandReadsFromAggregate(q))
    }
  }
}

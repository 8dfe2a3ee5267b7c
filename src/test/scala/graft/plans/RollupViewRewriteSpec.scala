package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.MaterializedRollup

/** [[RollupViewRewrite]]: coarse aggregates rerouted from the base scan to
  * a registered materialized rollup. Semantics tests compare the rewritten
  * result against the SAME query with the rule disabled (the direct base
  * aggregation is the oracle); plan tests assert which file the aggregate
  * actually reads; guard tests assert ineligible shapes keep the base
  * scan. */
class RollupViewRewriteSpec extends SparkSpec {
  import spark.implicits._

  // base with duplicate keys, nulls in a measure, negative values
  private def baseRows: Seq[(String, Int, Option[Double], Long)] = {
    val rnd = new scala.util.Random(13)
    Seq.tabulate(400) { i =>
      val k1 = "k" + rnd.nextInt(3)
      val k2 = rnd.nextInt(4)
      val x = if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 10 - 5)
      (k1, k2, x, rnd.nextInt(100).toLong)
    }
  }

  private def withBase[A](f: (String, DataFrame) => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_mv").toString
    try {
      baseRows.toDF("k1", "k2", "x", "n")
        .write.mode("overwrite").parquet(s"$root/base")
      MaterializedRollup.createAndRegister(spark, "mv_test", s"$root/base",
        s"$root/mv", keys = Seq("k1", "k2"), measures = Seq("x", "n"))
      f(root, spark.read.parquet(s"$root/base"))
    } finally {
      RollupViewRewrite.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  private def disabled[A](f: => A): A = {
    spark.conf.set(RollupViewRewrite.EnabledKey, "false")
    try f finally spark.conf.unset(RollupViewRewrite.EnabledKey)
  }

  private def scans(q: DataFrame, what: String): Boolean =
    q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten.exists(_.contains(what))

  private def sortedRows(q: DataFrame): Seq[String] =
    q.collect().map(_.toString).sorted.toSeq

  test("coarser grouping answers from the rollup, matching the base exactly") {
    withBase { (root, base) =>
      val q = base.groupBy($"k1").agg(
        count(lit(1)).as("n_rows"), sum($"x").as("sum_x"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        avg($"x").as("avg_x"), count($"x").as("cnt_x"),
        sum($"n").as("sum_n"), avg($"n").as("avg_n"))
      assert(scans(q, s"$root/mv") && !scans(q, s"$root/base"),
        q.queryExecution.optimizedPlan.toString.take(500))
      val got = sortedRows(q)
      val want = sortedRows(disabled(
        base.groupBy($"k1").agg(
          count(lit(1)).as("n_rows"), sum($"x").as("sum_x"),
          min($"x").as("min_x"), max($"x").as("max_x"),
          avg($"x").as("avg_x"), count($"x").as("cnt_x"),
          sum($"n").as("sum_n"), avg($"n").as("avg_n"))))
      assert(got === want)
    }
  }

  test("full-key grouping, global aggregate, and DISTINCT keys all reroute") {
    withBase { (root, base) =>
      val full = base.groupBy($"k1", $"k2").agg(sum($"x").as("s"))
      assert(scans(full, s"$root/mv"))
      assert(sortedRows(full) ===
        sortedRows(disabled(base.groupBy($"k1", $"k2").agg(sum($"x").as("s")))))

      val global = base.agg(count(lit(1)).as("c"), avg($"n").as("a"))
      assert(scans(global, s"$root/mv"))
      assert(sortedRows(global) ===
        sortedRows(disabled(base.agg(count(lit(1)).as("c"), avg($"n").as("a")))))

      val dist = base.select($"k1").distinct()
      assert(scans(dist, s"$root/mv"))
      assert(sortedRows(dist) === sortedRows(disabled(base.select($"k1").distinct())))
    }
  }

  test("key-only filters are replayed on the rollup; non-key filters refuse") {
    withBase { (root, base) =>
      val q = base.filter($"k2" > 1).groupBy($"k1")
        .agg(count(lit(1)).as("c"), avg($"x").as("a"))
      assert(scans(q, s"$root/mv") && !scans(q, s"$root/base"))
      assert(sortedRows(q) === sortedRows(disabled(
        base.filter($"k2" > 1).groupBy($"k1")
          .agg(count(lit(1)).as("c"), avg($"x").as("a")))))
      // empty selection stays empty from the rollup too
      val empty = base.filter($"k1" === "nope").groupBy($"k2").agg(sum($"n").as("s"))
      assert(scans(empty, s"$root/mv") && empty.count() === 0)
      // measure-column filter cannot be replayed -> base scan kept
      val nk = base.filter($"x" > 0).groupBy($"k1").agg(sum($"x").as("s"))
      assert(scans(nk, s"$root/base") && !scans(nk, s"$root/mv"))
      // non-deterministic filters sample ROWS; replaying one over the
      // collapsed rollup would sample GROUPS -> refuse. (A tautological
      // rand() < 2.0 doesn't exercise this: Catalyst removes it before
      // the rule runs, and rewriting is then correct.)
      val nd = base.filter(rand(7) < 0.5).groupBy($"k1").agg(sum($"x").as("s"))
      assert(scans(nd, s"$root/base") && !scans(nd, s"$root/mv"))
    }
  }

  test("guards: distinct aggs, computed inputs, uncovered columns refuse") {
    withBase { (root, base) =>
      val distinct = base.groupBy($"k1").agg(countDistinct($"k2").as("d"))
      assert(scans(distinct, s"$root/base"))
      val computed = base.groupBy($"k1").agg(sum($"x" + 1).as("s"))
      assert(scans(computed, s"$root/base"))
      val exprKey = base.groupBy(upper($"k1").as("u")).agg(sum($"x").as("s"))
      assert(scans(exprKey, s"$root/base"))
      val keyOutside = base.groupBy($"k1").agg(first($"x").as("f"))
      assert(scans(keyOutside, s"$root/base"))
      // grouping key not covered by the rollup's key set
      val otherKey = base.groupBy($"n").agg(count(lit(1)).as("c"))
      assert(scans(otherKey, s"$root/base"))
    }
  }

  test("refresh after base change re-points the rollup; unregister restores") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv2").toString
    try {
      Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$root/base")
      MaterializedRollup.createAndRegister(spark, "mv2", s"$root/base",
        s"$root/mv", keys = Seq("k"), measures = Seq("v"))
      val base = spark.read.parquet(s"$root/base")
      def total(): Double =
        base.agg(sum($"v")).collect().head.getDouble(0)
      assert(total() === 6.0)
      // base grows; the CACHED `base` relation still pins the pre-append
      // file listing, which matches the registered fingerprint — so the
      // rewrite fires and agrees with what this stale scan would read
      // anyway (a FRESH read diverges and is gate-refused: see the
      // out-of-band mutation test)...
      Seq(("b", 10.0)).toDF("k", "v")
        .write.mode("append").parquet(s"$root/base")
      assert(total() === 6.0)
      // ...until refreshed
      MaterializedRollup.createAndRegister(spark, "mv2", s"$root/base",
        s"$root/mv", keys = Seq("k"), measures = Seq("v"))
      assert(spark.read.parquet(s"$root/base").agg(sum($"v"))
        .collect().head.getDouble(0) === 16.0)
      RollupViewRewrite.unregister("mv2")
      val direct = spark.read.parquet(s"$root/base").agg(sum($"v"))
      assert(scans(direct, s"$root/base"))
    } finally {
      RollupViewRewrite.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("CUBE / ROLLUP / GROUPING SETS collapse onto the rollup (via PreAggExpand)") {
    withBase { (root, base) =>
      // grouping-sets aggregates become merge ∘ Expand ∘ partial-agg
      // (PreAggExpandRewrite); the partial agg is the plain mergeable
      // shape this rule reroutes — composition gives the collapse free
      def cubed(df: DataFrame): DataFrame = df
        .cube($"k1", $"k2")
        .agg(count(lit(1)).as("c"), sum($"x").as("sx"),
          avg($"x").as("ax"), min($"n").as("mn"), max($"n").as("mx"))
      val q = cubed(base)
      assert(scans(q, s"$root/mv") && !scans(q, s"$root/base"))
      assert(sortedRows(q) === disabled(sortedRows(cubed(base))))
      val rolled = base.rollup($"k1", $"k2").agg(sum($"n").as("sn"))
      assert(scans(rolled, s"$root/mv"))
      assert(sortedRows(rolled) ===
        disabled(sortedRows(base.rollup($"k1", $"k2").agg(sum($"n").as("sn")))))
    }
  }

  test("out-of-band base mutation disqualifies the rollup until refresh") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv_fresh").toString
    try {
      Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$root/base")
      MaterializedRollup.createAndRegister(spark, "mv_fresh", s"$root/base",
        s"$root/mv", keys = Seq("k"), measures = Seq("v"))
      val q0 = spark.read.parquet(s"$root/base").agg(sum($"v"))
      assert(scans(q0, s"$root/mv") && q0.collect().head.getDouble(0) === 3.0)
      assert(MaterializedRollup.verifyFresh(spark, "mv_fresh"))

      // mutate the base OUT OF BAND (no registrar involvement): an ad-hoc
      // append — the one silent-wrong-answer hole the fingerprint closes
      Seq(("b", 10.0)).toDF("k", "v")
        .write.mode("append").parquet(s"$root/base")
      val q1 = spark.read.parquet(s"$root/base").agg(sum($"v"))
      // the rewrite must be INERT: fresh listing ≠ registered fingerprint
      assert(scans(q1, s"$root/base") && !scans(q1, s"$root/mv"))
      assert(q1.collect().head.getDouble(0) === 13.0)
      assert(!MaterializedRollup.verifyFresh(spark, "mv_fresh"))

      // refresh re-fingerprints: active again, with the new total
      MaterializedRollup.createAndRegister(spark, "mv_fresh", s"$root/base",
        s"$root/mv", keys = Seq("k"), measures = Seq("v"))
      val q2 = spark.read.parquet(s"$root/base").agg(sum($"v"))
      assert(scans(q2, s"$root/mv") && q2.collect().head.getDouble(0) === 13.0)
      assert(MaterializedRollup.verifyFresh(spark, "mv_fresh"))
    } finally {
      RollupViewRewrite.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("a view registered in another session does not rewrite this one") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv_sess").toString
    try {
      Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$root/base")
      val other = spark.newSession()
      MaterializedRollup.createAndRegister(other, "mv_sess", s"$root/base",
        s"$root/mv", keys = Seq("k"), measures = Seq("v"))
      // the other session reroutes...
      val qOther = other.read.parquet(s"$root/base").agg(sum(col("v")))
      assert(scans(qOther, s"$root/mv"))
      // ...this session does not (JVM-global map, per-session visibility)
      val qHere = spark.read.parquet(s"$root/base").agg(sum($"v"))
      assert(scans(qHere, s"$root/base") && !scans(qHere, s"$root/mv"))
    } finally {
      RollupViewRewrite.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("applyDelta maintains the rollup incrementally, base never rescanned") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv5").toString
    try {
      // integer measures so incremental ≡ rebuild is EXACT, not tolerant
      val batch1 = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L))
      val batch2 = Seq(("a", 100L, -7L), ("c", 4L, 4L)) // new extreme + new key
      batch1.toDF("k", "v", "w").write.mode("overwrite").parquet(s"$root/base")
      MaterializedRollup.createAndRegister(spark, "mv5", s"$root/base",
        s"$root/mv", keys = Seq("k"), measures = Seq("v", "w"))
      // base grows by batch2; the rollup is refreshed from the DELTA alone
      batch2.toDF("k", "v", "w").write.mode("append").parquet(s"$root/base")
      MaterializedRollup.applyDelta(spark, "mv5", batch2.toDF("k", "v", "w"))
      val base = spark.read.parquet(s"$root/base")
      val q = base.groupBy($"k").agg(
        count(lit(1)).as("c"), sum($"v").as("sv"), min($"v").as("mnv"),
        max($"v").as("mxv"), avg($"v").as("av"),
        min($"w").as("mnw"), max($"w").as("mxw"))
      assert(scans(q, s"$root/mv") && !scans(q, s"$root/base"))
      assert(sortedRows(q) === sortedRows(disabled(
        base.groupBy($"k").agg(
          count(lit(1)).as("c"), sum($"v").as("sv"), min($"v").as("mnv"),
          max($"v").as("mxv"), avg($"v").as("av"),
          min($"w").as("mnw"), max($"w").as("mxw")))))
      // and incremental content equals a from-scratch rebuild exactly
      val inc = spark.read.parquet(s"$root/mv")
        .collect().map(_.toString).sorted.toSeq
      val rebuilt = MaterializedRollup.build(
        disabled(base), Seq("k"), Seq("v", "w"))
        .collect().map(_.toString).sorted.toSeq
      assert(inc === rebuilt)
    } finally {
      RollupViewRewrite.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("fewest-keys cover wins when several rollups match") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv3").toString
    try {
      baseRows.toDF("k1", "k2", "x", "n")
        .write.mode("overwrite").parquet(s"$root/base")
      MaterializedRollup.createAndRegister(spark, "wide", s"$root/base",
        s"$root/mv_wide", keys = Seq("k1", "k2"), measures = Seq("x"))
      MaterializedRollup.createAndRegister(spark, "slim", s"$root/base",
        s"$root/mv_slim", keys = Seq("k1"), measures = Seq("x"))
      val q = spark.read.parquet(s"$root/base")
        .groupBy($"k1").agg(sum($"x").as("s"))
      assert(scans(q, s"$root/mv_slim") && !scans(q, s"$root/mv_wide"))
      assert(sortedRows(q) === sortedRows(disabled(
        spark.read.parquet(s"$root/base").groupBy($"k1").agg(sum($"x").as("s")))))
    } finally {
      RollupViewRewrite.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("plain SQL over a temp view is rewritten too") {
    withBase { (root, base) =>
      base.createOrReplaceTempView("rvr_base")
      try {
        val q = spark.sql(
          """SELECT k1, COUNT(*) AS c, SUM(x) AS sx, AVG(n) AS an
            |FROM rvr_base WHERE k2 = 1 GROUP BY k1""".stripMargin)
        assert(scans(q, s"$root/mv") && !scans(q, s"$root/base"))
        assert(sortedRows(q) === sortedRows(disabled(spark.sql(
          """SELECT k1, COUNT(*) AS c, SUM(x) AS sx, AVG(n) AS an
            |FROM rvr_base WHERE k2 = 1 GROUP BY k1""".stripMargin))))
      } finally spark.catalog.dropTempView("rvr_base")
    }
  }

  test("star-schema shape: the fact side of a join collapses to the rollup") {
    withBase { (root, base) =>
      val dim = Seq(("k0", "north"), ("k1", "south"), ("k2", "north"))
        .toDF("dk", "region")
      def q() = base.join(dim, base("k1") === dim("dk"))
        .groupBy($"region")
        .agg(count(lit(1)).as("pairs"), sum($"x").as("sx"),
          avg($"n").as("an"), max($"x").as("mx"))
        .orderBy($"region")
      assert(scans(q(), s"$root/mv") && !scans(q(), s"$root/base"),
        q().queryExecution.optimizedPlan.toString.take(600))
      assert(sortedRows(q()) === sortedRows(disabled(q())))
      // grouping may also MIX dim attrs and fact keys
      val mixed = base.join(dim, base("k1") === dim("dk"))
        .groupBy($"region", $"k2").agg(sum($"n").as("sn"))
      assert(scans(mixed, s"$root/mv"))
      assert(sortedRows(mixed) === sortedRows(disabled(
        base.join(dim, base("k1") === dim("dk"))
          .groupBy($"region", $"k2").agg(sum($"n").as("sn")))))
      // fact-side key filter under the join is replayed on the rollup
      val filtered = base.filter($"k2" <= 2)
        .join(dim, base("k1") === dim("dk"))
        .groupBy($"region").agg(sum($"x").as("sx"))
      assert(scans(filtered, s"$root/mv") && !scans(filtered, s"$root/base"))
      assert(sortedRows(filtered) === sortedRows(disabled(
        base.filter($"k2" <= 2).join(dim, base("k1") === dim("dk"))
          .groupBy($"region").agg(sum($"x").as("sx")))))
    }
  }

  test("dim-side aggregates rewrite with cnt-weighting, exactly") {
    withBase { (root, base) =>
      // weight has a NULL (avg/count denominators) and integer wint checks
      // the long-typed weighted product path
      val dim = Seq(("k0", Some(1.5), 10), ("k1", None, 20), ("k2", Some(2.5), 30))
        .toDF("dk", "weight", "wint")
      def q() = base.join(dim, base("k1") === dim("dk"))
        .groupBy($"k2")
        .agg(sum($"weight").as("sw"), avg($"weight").as("aw"),
          count($"weight").as("cw"), min($"weight").as("mnw"),
          max($"weight").as("mxw"), sum($"wint").as("swi"),
          sum($"x").as("sx"))
        .orderBy($"k2")
      assert(scans(q(), s"$root/mv") && !scans(q(), s"$root/base"),
        q().queryExecution.optimizedPlan.toString.take(600))
      assert(sortedRows(q()) === sortedRows(disabled(q())))
    }
  }

  test("join guards: measure-keyed joins and outer joins refuse") {
    withBase { (root, base) =>
      val dim = Seq(("k0", 1.5), ("k1", 2.5)).toDF("dk", "weight")
      // join condition on a fact MEASURE cannot replay on the rollup
      val measJoin = base.join(dim, base("x") > dim("weight"))
        .groupBy($"k1").agg(count(lit(1)).as("c"))
      assert(scans(measJoin, s"$root/base") && !scans(measJoin, s"$root/mv"))
      // outer joins refuse (unmatched-row semantics differ per multiplicity)
      val outer = base.join(dim, base("k1") === dim("dk"), "left")
        .groupBy($"k2").agg(sum($"x").as("sx"))
      assert(scans(outer, s"$root/base") && !scans(outer, s"$root/mv"))
    }
  }

  test("self-registration is refused; decimal sums keep the base scan") {
    val root = java.nio.file.Files.createTempDirectory("graft_mv4").toString
    try {
      Seq(("a", BigDecimal(1.5))).toDF("k", "d")
        .write.mode("overwrite").parquet(s"$root/base")
      intercept[IllegalArgumentException] {
        MaterializedRollup.register(spark, "self", s"$root/base",
          s"$root/base", Seq("k"), Seq("d"))
      }
      // createAndRegister refuses BEFORE the destructive overwrite — the
      // base table must survive the attempt intact
      val rowsBefore = spark.read.parquet(s"$root/base").count()
      intercept[IllegalArgumentException] {
        MaterializedRollup.createAndRegister(spark, "self2", s"$root/base",
          s"$root/base", Seq("k"), Seq("d"),
          base = Some(spark.read.parquet(s"$root/base")))
      }
      assert(spark.read.parquet(s"$root/base").count() === rowsBefore)
      MaterializedRollup.createAndRegister(spark, "mv4", s"$root/base",
        s"$root/mv", keys = Seq("k"), measures = Seq("d"))
      val q = spark.read.parquet(s"$root/base").groupBy($"k").agg(sum($"d").as("s"))
      assert(scans(q, s"$root/base") && !scans(q, s"$root/mv"))
    } finally {
      RollupViewRewrite.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}

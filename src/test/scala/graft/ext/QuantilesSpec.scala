package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("interpolated quantiles match the quantile_cont definition") {
    // group a: values 1..4 → p50 = 2.5 (interpolated), p25 = 1.75
    // group b: single value → every quantile is that value
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 7.0))
      .toDF("g", "v")
    val out = Quantiles.exactQuantiles(df, "g",
        Seq(("v", 0.25, "p25"), ("v", 0.5, "p50"), ("v", 1.0, "p100")))
      .orderBy("g").collect()
    assert(out(0).getDouble(1) === 1.75)
    assert(out(0).getDouble(2) === 2.5)
    assert(out(0).getDouble(3) === 4.0)
    assert(out(1).getDouble(1) === 7.0 && out(1).getDouble(2) === 7.0)
  }

  test("nulls excluded per column; multiple columns in one pass") {
    val df = Seq(
      ("a", Some(10.0), Some(1.0)), ("a", None, Some(3.0)),
      ("a", Some(20.0), None))
      .toDF("g", "x", "y")
    val out = Quantiles.exactQuantiles(df, "g",
        Seq(("x", 0.5, "mx"), ("y", 0.5, "my"))).collect().head
    assert(out.getDouble(1) === 15.0) // median of (10, 20) — null dropped
    assert(out.getDouble(2) === 2.0) // median of (1, 3)
  }

  test("all-null column yields NULL (not 0.0); all-null group is kept") {
    val df = Seq(
      ("a", None: Option[Double], Some(1.0)), ("a", None: Option[Double], Some(3.0)),
      ("b", None: Option[Double], None: Option[Double]))
      .toDF("g", "x", "y")
    val out = Quantiles.exactQuantiles(df, "g",
        Seq(("x", 0.5, "mx"), ("y", 0.5, "my")))
      .orderBy("g").collect()
    assert(out.length === 2) // group b survives despite having no values at all
    assert(out(0).isNullAt(1)) // a.x: no non-null values → NULL, not 0.0
    assert(out(0).getDouble(2) === 2.0)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("NULL group key is a real group (SQL GROUP BY semantics)") {
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 3.0),
      (None: Option[String], 10.0), (None: Option[String], 20.0))
      .toDF("g", "v")
    val out = Quantiles.exactQuantiles(df, "g", Seq(("v", 0.5, "med")))
      .orderBy(col("g").asc_nulls_first).collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(0) && out(0).getDouble(1) === 15.0) // NULL group computed, not NULLed out
    assert(out(1).getString(0) === "a" && out(1).getDouble(1) === 2.0)
  }

  test("agrees with Spark's builtin percentile on real data") {
    val li = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ours = Quantiles.exactQuantiles(li, "l_returnflag",
        Seq(("l_quantity", 0.25, "p25"), ("l_extendedprice", 0.9, "p90")))
      .orderBy("l_returnflag").collect()
    val builtin = li.groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .orderBy("l_returnflag").collect()
    ours.zip(builtin).foreach { case (o, b) =>
      assert(math.abs(o.getDouble(1) - b.getDouble(1)) < 1e-9)
      assert(math.abs(o.getDouble(2) - b.getDouble(2)) < 1e-9)
    }
  }

  test("valueAtRankLong equals sorted indexing: duplicates, negatives, nulls") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals: Seq[Long] = Seq.fill(500)(rnd.nextLong() % 1000L) ++
      Seq(Long.MinValue / 4, Long.MaxValue / 4, 0L, 0L, -1L)
    val df = (vals.map(Option(_)) ++ Seq(None, None)).toDF("v")
    val sorted = vals.sorted
    for (r <- Seq(1, 2, 17, 250, sorted.length)) {
      assert(Quantiles.valueAtRankLong(df, "v", r.toLong) === sorted(r - 1),
        s"rank $r")
    }
    intercept[IllegalArgumentException] {
      Quantiles.valueAtRankLong(df, "v", sorted.length + 1L)
    }
    intercept[IllegalArgumentException] {
      Quantiles.valueAtRankLong(df, "v", 0L)
    }
  }

  test("valueAtRankLong narrows recursively on a narrow value band") {
    import spark.implicits._
    // epoch-microsecond-like band: all values inside one default-width
    // level-0 bucket (the round-13 advisory degeneracy) — a tiny
    // maxCollect forces several narrowing levels, and the answer must
    // still be exact sorted indexing at every probed rank
    val base = 1704067200000000L // 2024-01-01 in epoch micros
    val rnd = new scala.util.Random(13)
    val vals: Seq[Long] =
      Seq.fill(2000)(base + (rnd.nextLong() % 86400000000L).abs) ++
        Seq.fill(50)(base + 1234L) // a duplicate pile inside the band
    val df = vals.toDF("v")
    val sorted = vals.sorted
    for (r <- Seq(1, 100, 1025, 1640, sorted.length)) {
      assert(Quantiles.valueAtRankLong(df, "v", r.toLong,
          bucketBits = 4, maxCollect = 8L) === sorted(r - 1),
        s"rank $r (narrowed)")
      // and the default knobs agree
      assert(Quantiles.valueAtRankLong(df, "v", r.toLong) === sorted(r - 1),
        s"rank $r (default)")
    }
  }
}

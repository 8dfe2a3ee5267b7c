package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TilingSpec extends SparkSpec {
  import spark.implicits._

  test("ntileByValue equals the window NTILE on real data (every n)") {
    val o = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    for (n <- Seq(1, 3, 10, 64)) {
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      val expected = o.select(col("o_orderkey"),
        ntile(n).over(w).cast("long").as("t")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Tiling.ntileByValue(o, n, "o_totalprice", "o_orderkey")
        .select(col("o_orderkey"), col("tile")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"mismatch at n=$n")
    }
  }

  test("exact global rank: ties broken by tie column, nulls first") {
    val df = Seq(
      (1L, Some(5.0)), (2L, Some(5.0)), (3L, None),
      (4L, Some(1.0)), (5L, Some(9.0)), (6L, None))
      .toDF("id", "v")
    val ranked = Tiling.ntileByValue(df, 2, "v", "id")
      .select(col("id"), col("__rank"), col("tile"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // null values rank first (3 before 6 by tie), then 1.0, then the 5.0
    // tie pair by id, then 9.0
    assert(ranked === Set(
      (3L, 1L, 1L), (6L, 2L, 1L), (4L, 3L, 1L),
      (1L, 4L, 2L), (2L, 5L, 2L), (5L, 6L, 2L)))
  }

  test("fewer rows than tiles: one row per leading tile") {
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val got = Tiling.ntileByValue(df, 5, "v", "id")
      .select(col("id"), col("tile")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("totalCol exposes the row count; rank-median equals median() per tile") {
    val o = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_totalprice"), col("o_orderkey"))
    val total = o.count()
    val tiled = Tiling.ntileByValue(o, 10, "o_totalprice", "o_orderkey",
      tileCol = "decile", totalCol = Some("__total"))
    // every row carries the exact total
    assert(tiled.select(col("__total")).distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(total))
    // the q59 construction: NTILE rank spans are closed-form from the
    // total alone, so each decile's median is a 2-rank selection — must
    // equal Spark's buffering median() aggregate exactly
    val k = col("decile")
    val base = floor(col("__total") / 10).cast("long")
    val rem = col("__total") % 10
    val ck = base + when(k <= rem, lit(1L)).otherwise(lit(0L))
    val rk0 = (k - 1) * base + least(k - 1, rem) + 1
    val half = floor((ck - 1) / 2).cast("long")
    val posLo = rk0 + half
    val posHi = rk0 + (ck - 1) - half
    val got = tiled.groupBy(k)
      .agg(((sum(when(col("__rank") === posLo, col("o_totalprice")))
        + sum(when(col("__rank") === posHi, col("o_totalprice")))) / 2)
        .as("med"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = tiled.groupBy(k)
      .agg(expr("median(o_totalprice)").as("med"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("no single-partition row-sized exchange in the plan") {
    val o = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val plan = Tiling.ntileByValue(o, 10, "o_totalprice", "o_orderkey")
      .queryExecution.executedPlan.toString
    // the only SinglePartition stages may be over the tiny bucket-count
    // relation (below its aggregation); the raw scan must never feed one
    val rowSized = "Exchange SinglePartition".r.findAllIn(
      plan.split("== Initial Plan ==")(0)).length
    assert(rowSized <= 1, s"row-sized single-partition exchanges: $plan")
  }
}

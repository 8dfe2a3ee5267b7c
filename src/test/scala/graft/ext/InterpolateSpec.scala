package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("densify emits each key's own hour spine with NULL holes") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 03:00:00"), 40.0),
      (2L, ts("2024-01-01 05:00:00"), 7.0))
      .toDF("k", "h", "v")
    val got = Interpolate.densify(obs, Seq("k"), "h", "v")
      .orderBy("k", "h")
      .as[(Long, Timestamp, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(10.0)),
      (1L, ts("2024-01-01 01:00:00"), None),
      (1L, ts("2024-01-01 02:00:00"), None),
      (1L, ts("2024-01-01 03:00:00"), Some(40.0)),
      (2L, ts("2024-01-01 05:00:00"), Some(7.0))))
  }

  test("linear fills interior gaps proportionally and clamps edges") {
    val obs = Seq(
      (1L, ts("2024-01-01 01:00:00"), 10.0),
      (1L, ts("2024-01-01 04:00:00"), 40.0),
      (1L, ts("2024-01-01 06:00:00"), 20.0))
      .toDF("k", "h", "v")
    val got = Interpolate.linear(obs, Seq("k"), "h", "v")
      .orderBy("h")
      .select(col("h"), col("v"), col("filled"))
      .as[(Timestamp, Double, Int)].collect().toSeq
    assert(got === Seq(
      (ts("2024-01-01 01:00:00"), 10.0, 0),
      (ts("2024-01-01 02:00:00"), 20.0, 1), // 10 + 30*(1/3)
      (ts("2024-01-01 03:00:00"), 30.0, 1), // 10 + 30*(2/3)
      (ts("2024-01-01 04:00:00"), 40.0, 0),
      (ts("2024-01-01 05:00:00"), 30.0, 1), // 40 + (20-40)*(1/2)
      (ts("2024-01-01 06:00:00"), 20.0, 0)))
  }

  test("a key with a single observation yields a 1-row spine, observed") {
    val obs = Seq((9L, ts("2024-02-01 12:00:00"), 5.5)).toDF("k", "h", "v")
    val rows = Interpolate.linear(obs, Seq("k"), "h", "v")
      .select(col("k"), col("h"), col("v"), col("filled")).collect()
    assert(rows.length === 1)
    assert(rows.head.getDouble(2) === 5.5 && rows.head.getInt(3) === 0)
  }

  test("off-grid gaps neither crash nor drop grid cells") {
    // gap smaller than the step: both observations survive, nothing else
    val tight = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:20:00"), 2.0)).toDF("k", "h", "v")
    val gotTight = Interpolate.linear(tight, Seq("k"), "h", "v")
      .orderBy("h").select(col("h"), col("v")).as[(Timestamp, Double)]
      .collect().toSeq
    assert(gotTight === Seq(
      (ts("2024-01-01 10:00:00"), 1.0), (ts("2024-01-01 10:20:00"), 2.0)))
    // gap that is not a step multiple: the 11:00 grid cell must still
    // exist, interpolated at 2/3 of the way to the 11:30 observation
    val off = Seq(
      (1L, ts("2024-01-01 10:00:00"), 0.0),
      (1L, ts("2024-01-01 11:30:00"), 3.0)).toDF("k", "h", "v")
    val gotOff = Interpolate.linear(off, Seq("k"), "h", "v")
      .orderBy("h").select(col("h"), col("v"), col("filled"))
      .as[(Timestamp, Double, Int)].collect().toSeq
    assert(gotOff === Seq(
      (ts("2024-01-01 10:00:00"), 0.0, 0),
      (ts("2024-01-01 11:00:00"), 2.0, 1), // 0 + 3·(3600/5400)
      (ts("2024-01-01 11:30:00"), 3.0, 0)))
  }

  test("sub-hour step densifies on the finer grid") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0.0),
      (1L, ts("2024-01-01 00:30:00"), 3.0))
      .toDF("k", "h", "v")
    val got = Interpolate.linear(obs, Seq("k"), "h", "v",
        step = "INTERVAL 15 MINUTE")
      .orderBy("h").select(col("v")).as[Double].collect().toSeq
    assert(got === Seq(0.0, 1.5, 3.0))
  }
}

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams builds overlapping grams; short text → empty") {
    val df = Seq("a b c d", "a b", "a", "").toDF("text")
    val got = df.select(TextStats.wordNgrams(col("text"), 3)).as[Seq[String]]
      .collect().toSeq
    assert(got === Seq(Seq("a b c", "b c d"), Seq(), Seq(), Seq()))
  }

  test("dupNgramFraction: known repetition fractions") {
    val df = Seq(
      ("all distinct", "a b c d e"),        // 4 distinct bigrams of 4
      ("all same", "x y x y x y"),          // bigrams: xy yx xy yx xy -> 2/5 distinct
      ("short", "one"))
      .toDF("name", "text")
    val got = df.select(col("name"),
        round(TextStats.dupNgramFraction(col("text"), 2), 4).as("f"))
      .as[(String, Double)].collect().toMap
    assert(got("all distinct") === 0.0)
    assert(got("all same") === 0.6) // 1 - 2/5
    assert(got("short") === 0.0)
  }
}

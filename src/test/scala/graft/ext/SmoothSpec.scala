package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Smooth]] — per-key EWMA recurrence; corpus face oracle-checked as
  * x52_ewma against the closed-form expansion. */
class SmoothSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("ewma follows the recurrence per key, resets across keys") {
    val df = Seq(
      (1L, ts(1), 10.0), (1L, ts(2), 20.0), (1L, ts(3), 10.0),
      (2L, ts(1), 100.0), (2L, ts(2), 0.0)
    ).toDF("user_id", "ts", "value")
    val got = Smooth.ewma(df, "user_id", "ts", "value", alpha = 0.5)
      .orderBy("user_id", "ts")
      .select("user_id", "ewma").as[(Long, Double)].collect().toSeq
    // key 1: 10, 15, 12.5 ; key 2: 100, 50
    assert(got === Seq((1L, 10.0), (1L, 15.0), (1L, 12.5),
      (2L, 100.0), (2L, 50.0)))
  }

  test("null values pass through without advancing the state") {
    val df = Seq(
      (1L, ts(1), Option(10.0)), (1L, ts(2), Option.empty[Double]),
      (1L, ts(3), Option(20.0))
    ).toDF("user_id", "ts", "value")
    val got = Smooth.ewma(df, "user_id", "ts", "value", alpha = 0.5)
      .orderBy("ts").select("ewma").collect()
    assert(got(0).getDouble(0) === 10.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) === 15.0) // 0.5*20 + 0.5*10, null skipped
  }

  test("partition-parallel run equals a single-partition run") {
    val rows = for (k <- 1L to 20L; i <- 1 to 50)
      yield (k, ts(i), (i * 13 % 7).toDouble + k)
    val df = rows.toDF("user_id", "ts", "value")
    val wide = Smooth.ewma(df.repartition(16), "user_id", "ts", "value", 0.3)
      .orderBy("user_id", "ts").select("ewma").as[Double].collect().toSeq
    val narrow = Smooth.ewma(df.coalesce(1), "user_id", "ts", "value", 0.3)
      .orderBy("user_id", "ts").select("ewma").as[Double].collect().toSeq
    assert(wide === narrow)
  }
}

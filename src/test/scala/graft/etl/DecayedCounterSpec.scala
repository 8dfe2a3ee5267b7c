package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DecayedCounter]] — recency-weighted counts with an algebraically
  * mergeable state. Cross-engine arithmetic pinned by x65_decayed. */
class DecayedCounterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (String, String, Double)*): DataFrame =
    rows.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "ts", "v")

  private val H = 3600.0 // 1-hour half-life

  test("closed form: an event h ago counts half; now counts 1") {
    val df = events(("a", "2024-01-01 11:00:00", 10.0),
      ("a", "2024-01-01 12:00:00", 4.0))
    val got = DecayedCounter
      .aggregate(df, Seq("k"), "ts", "v", "2024-01-01 12:00:00", H)
      .select("dcount", "dsum").as[(Double, Double)].head()
    assert(math.abs(got._1 - 1.5) < 1e-12)          // 0.5 + 1
    assert(math.abs(got._2 - (10.0 * 0.5 + 4.0)) < 1e-12)
  }

  test("incremental fold equals the single-pass recompute (any slicing)") {
    val all = events(
      ("a", "2024-01-01 10:00:00", 1.0), ("a", "2024-01-01 11:30:00", 2.0),
      ("b", "2024-01-01 11:00:00", 3.0), ("a", "2024-01-01 12:15:00", 4.0),
      ("c", "2024-01-01 12:30:00", 5.0)) // c only in the delta
    val full = DecayedCounter
      .aggregate(all, Seq("k"), "ts", "v", "2024-01-01 13:00:00", H)
      .select("k", "dcount", "dsum").as[(String, Double, Double)]
      .collect().sortBy(_._1)
    val boot = DecayedCounter.aggregate(
      all.filter(col("ts") < lit("2024-01-01 12:00:00").cast("timestamp")),
      Seq("k"), "ts", "v", "2024-01-01 12:00:00", H)
    val folded = DecayedCounter.update(
      boot,
      all.filter(col("ts") >= lit("2024-01-01 12:00:00").cast("timestamp")),
      Seq("k"), "ts", "v", "2024-01-01 13:00:00", H)
      .select("k", "dcount", "dsum").as[(String, Double, Double)]
      .collect().sortBy(_._1)
    assert(full.map(_._1).toSeq === folded.map(_._1).toSeq)
    full.zip(folded).foreach { case ((_, c1, s1), (_, c2, s2)) =>
      assert(math.abs(c1 - c2) < 1e-9 && math.abs(s1 - s2) < 1e-9)
    }
  }

  test("decay is monotone in the reference time; state-only key decays through") {
    val df = events(("a", "2024-01-01 10:00:00", 1.0))
    def at(ref: String): Double = DecayedCounter
      .aggregate(df, Seq("k"), "ts", "v", ref, H)
      .select("dcount").as[Double].head()
    assert(at("2024-01-01 10:00:00") > at("2024-01-01 12:00:00"))
    // update with an EMPTY delta just decays the state
    val boot = DecayedCounter
      .aggregate(df, Seq("k"), "ts", "v", "2024-01-01 10:00:00", H)
    val later = DecayedCounter.update(boot, df.limit(0), Seq("k"),
      "ts", "v", "2024-01-01 11:00:00", H)
      .select("dcount").as[Double].head()
    assert(math.abs(later - 0.5) < 1e-12)
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[JoinGuard]] — pre-join fan-out measurement + bounded join.
  * Oracle face: x80_join_guard. */
class JoinGuardSpec extends SparkSpec {
  import spark.implicits._

  // key 7 is the production surprise: 10 x 20 = 200 amplification
  private lazy val left = ((1L to 5L).map(k => (k, s"l$k")) ++
    (1L to 10L).map(i => (7L, s"hot$i"))).toDF("k", "lv")
  private lazy val right = ((1L to 3L).map(k => (k, s"r$k")) ++
    (1L to 20L).map(i => (7L, s"rhot$i"))).toDF("k", "rv")

  test("fanoutReport: per-key products, one-sided keys excluded") {
    val rep = fanout(1)
    assert(rep === Map(1L -> ((1L, 1L, 1L)), 2L -> ((1L, 1L, 1L)),
      3L -> ((1L, 1L, 1L)), 7L -> ((10L, 20L, 200L))))
    // keys 4, 5 are left-only: absent
  }

  test("minFanout screens to the offending tail") {
    assert(fanout(2).keySet === Set(7L))
  }

  test("guardedJoin excludes offenders, keeps everything else intact") {
    val (joined, offenders) = JoinGuard.guardedJoin(left, right,
      Seq("k"), maxFanout = 50)
    assert(offenders.select("k").as[Long].collect().toSeq === Seq(7L))
    val rows = joined.select("k", "lv", "rv")
      .as[(Long, String, String)].collect().toSet
    assert(rows === Set((1L, "l1", "r1"), (2L, "l2", "r2"), (3L, "l3", "r3")))
  }

  test("within-bound joins pass through untouched") {
    val (joined, offenders) = JoinGuard.guardedJoin(left, right,
      Seq("k"), maxFanout = 200)
    assert(offenders.count() === 0L)
    assert(joined.count() === 3L + 200L)
  }

  test("guardedJoinOrThrow names the offenders") {
    val e = intercept[IllegalStateException] {
      JoinGuard.guardedJoinOrThrow(left, right, Seq("k"), maxFanout = 50)
    }
    assert(e.getMessage.contains("200"))
    // and the permissive bound returns the full join
    assert(JoinGuard.guardedJoinOrThrow(left, right, Seq("k"), 200)
      .count() === 203L)
  }

  private def fanout(min: Long): Map[Long, (Long, Long, Long)] =
    JoinGuard.fanoutReport(left, right, Seq("k"), min)
      .select("k", "n_left", "n_right", "fanout")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Curation.matchDistribution]] — exact distribution-matching
  * resampler. Oracle face: x75_match_dist. */
class MatchDistSpec extends SparkSpec {
  import spark.implicits._

  // 60 a / 30 b / 10 c
  private lazy val docs = (1L to 100L).map { i =>
    val b = if (i <= 60) "a" else if (i <= 90) "b" else "c"
    (i, b)
  }.toDF("doc_id", "bucket")

  test("scarcest bucket binds; shares match the target exactly") {
    // target 50/25/25: c binds (10 / 0.25 = 40 = T), quotas 20/10/10
    val got = Curation.matchDistribution(docs,
      Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    val by = got.groupBy("bucket").count()
      .as[(String, Long)].collect().toMap
    assert(by === Map("a" -> 20L, "b" -> 10L, "c" -> 10L))
  }

  test("unnormalized shares normalize; buckets outside the target drop") {
    // 2:1 over (a, b) only — c is not in the target and must vanish;
    // b binds: T = floor(30 / (1/3)) = 90 -> quotas 60/30
    val got = Curation.matchDistribution(docs, Seq("a" -> 2.0, "b" -> 1.0))
    val by = got.groupBy("bucket").count()
      .as[(String, Long)].collect().toMap
    assert(by === Map("a" -> 60L, "b" -> 30L))
  }

  test("a target bucket absent from the corpus forces an empty result") {
    val got = Curation.matchDistribution(docs,
      Seq("a" -> 0.5, "nosuch" -> 0.5))
    assert(got.count() === 0L)
  }

  test("draw is deterministic and growth-stable for surviving ids") {
    val first = Curation.matchDistribution(docs,
        Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .select("doc_id").as[Long].collect().toSet
    val again = Curation.matchDistribution(docs,
        Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .select("doc_id").as[Long].collect().toSet
    assert(first === again)
  }

  test("quota and bucket_n columns expose the apportionment") {
    val q = Curation.matchDistribution(docs,
        Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .select("bucket", "quota", "bucket_n").distinct()
      .as[(String, Long, Long)].collect().toMap2
    assert(q("a") === ((20L, 60L)))
    assert(q("c") === ((10L, 10L)))
  }

  private implicit class M(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._
  import Checks._

  private lazy val df = Seq(
    (1L, Some(10L), 5.0, "O"),
    (2L, Some(20L), -1.0, "F"),   // range violation
    (2L, Some(20L), 3.0, "O"),    // duplicate key
    (3L, None, 7.0, "X"),         // null FK + bad status
    (4L, Some(99L), 2.0, "O")     // dangling FK
  ).toDF("k", "fk", "v", "s")

  private lazy val dim = Seq(10L, 20L).toDF("id")

  test("every constraint class reports its exact violation count") {
    val got = validate(df, Seq(
        NotNull("fk"),
        InRange("v", 0.0, 100.0),
        Satisfies("s_domain", col("s").isin("O", "F")),
        Unique(Seq("k")),
        RefIntegrity(Seq("fk"), dim, Seq("id"))))
      .as[(String, Long)].collect().toMap
    assert(got("fk_not_null") === 1L)
    assert(got("v_range") === 1L)
    assert(got("s_domain") === 1L)
    assert(got("k_unique") === 1L)  // one row beyond the first for k=2
    assert(got("fk_ref") === 1L)    // 99 dangles; NULL fk is not a ref violation
  }

  test("clean data reports zero violations everywhere") {
    val clean = Seq((1L, Some(10L), 1.0, "O"), (2L, Some(20L), 2.0, "F"))
      .toDF("k", "fk", "v", "s")
    val got = validate(clean, Seq(
        NotNull("fk"), InRange("v", 0.0, 10.0), Unique(Seq("k")),
        RefIntegrity(Seq("fk"), dim, Seq("id"))))
      .as[(String, Long)].collect()
    assert(got.forall(_._2 === 0L))
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
  }

  test("row-local checks share one scan; NULL predicate counts as violation") {
    val d2 = Seq((1L, Option.empty[Double])).toDF("k", "v")
    val got = validate(d2, Seq(
        Satisfies("v_pos", col("v") > 0))) // NULL > 0 is NULL -> violation
      .as[(String, Long)].collect().head
    assert(got === (("v_pos", 1L)))
    // plan: the three row-local constraints of the composite case compile
    // to ONE aggregate over ONE scan
    val plan = validate(df, Seq(NotNull("fk"), InRange("v", 0, 1),
        Satisfies("x", col("s") === "O")))
      .queryExecution.executedPlan.toString
    assert("FileScan|LocalTableScan".r.findAllIn(plan).size <= 1, plan)
  }

  test("composite unique keys") {
    val d = Seq((1L, "a"), (1L, "b"), (1L, "a")).toDF("x", "y")
    val got = validate(d, Seq(Unique(Seq("x", "y"))))
      .as[(String, Long)].collect().head
    assert(got === (("x_y_unique", 1L)))
  }

  test("kAnonymity: sub-k quasi-identifier groups surface; NULL is a value") {
    val d = Seq(
      ("en", Some("s1")), ("en", Some("s1")), ("en", Some("s1")), // k=3 ok
      ("fr", Some("s1")), ("fr", Some("s1")),                    // 2 < 3
      ("de", None), ("de", None), ("de", None),                  // NULL group ok
      ("es", Some("s2")))                                        // singleton
      .toDF("lang", "source")
    val got = Checks.kAnonymity(d, Seq("lang", "source"), k = 3)
      .as[(String, Option[String], Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(("fr", Some("s1")) -> 2L, ("es", Some("s2")) -> 1L))
    // a clean release at k=2: only the singleton remains
    assert(Checks.kAnonymity(d, Seq("lang", "source"), 2).count() === 1L)
    intercept[IllegalArgumentException] {
      Checks.kAnonymity(d, Seq("lang"), k = 1)
    }
  }

  test("functional dependency: excess distinct values; nulls never violate") {
    val d = Seq(
      ("z1", "NY", Some("usa")), ("z1", "NY", Some("usa")), // consistent
      ("z2", "LA", Some("usa")), ("z2", "SF", Some("usa")), // zip->city broken
      ("z3", "CH", None), ("z3", "CH", Some("usa")))        // null dep ok
      .toDF("zip", "city", "country")
    val got = validate(d, Seq(
        FunctionalDependency(Seq("zip"), "city"),
        FunctionalDependency(Seq("zip"), "country"),
        FunctionalDependency(Seq("zip", "city"), "country")))
      .as[(String, Long)].collect().toMap
    assert(got("zip_determines_city") === 1L)       // z2 has 2 cities
    assert(got("zip_determines_country") === 0L)    // null ignored
    assert(got("zip_city_determines_country") === 0L)
    // discovery read: a held FD reports 0, magnitude says how broken
    val worse = d.union(Seq(("z2", "SD", Some("usa"))).toDF("zip", "city", "country"))
    assert(validate(worse, Seq(FunctionalDependency(Seq("zip"), "city")))
      .as[(String, Long)].collect().head._2 === 2L)
  }
}

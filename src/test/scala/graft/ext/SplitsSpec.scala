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

  test("composed with near-dup components: duplicate pairs never straddle a split") {
    // THE reason group splits exist for LLM corpora: split by the dedup
    // CLUSTER label, so a near-dup pair (one doc slightly edited) can
    // never land one side in train and one in test
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // ~1
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "pack my box with five dozen liquor jugs now"),       // ~3
      (5L, "completely unrelated text about something else"))
      .toDF("doc_id", "text")
    val edges = Dedup.nearDupPairs(texts, "doc_id", "text")
    val labels = Dedup.connectedComponents(edges)
      .withColumnRenamed("id", "doc_id")
      .withColumnRenamed("cluster", "grp")
    val labeled = texts.join(labels, Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("grp"), col("doc_id")))
    val split = Splits.byGroup(labeled, "grp")
    assert(Splits.leakageAudit(split, "grp").count() === 0L)
    // the near-dup pairs share their split by construction
    val byId = split.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(byId(1L) === byId(2L))
    assert(byId(3L) === byId(4L))
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

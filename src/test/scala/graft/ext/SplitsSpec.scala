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

  test("byTimeEmbargo: cutoff at exact rank, embargo half-open, ties to train") {
    // 10 rows, one per hour; trainPermille 600 → rank 6 → cutoff = hour 6
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600L * 1000)
    val ev = (1 to 10).map(h => (h.toLong, at(h))).toDF("id", "ts")
    val got = Splits.byTimeEmbargo(ev, "ts", trainPermille = 600,
        embargo = "2 hours")
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    // train: hours 1..6 (cutoff instant in train); embargo: (6, 8) → 7;
    // test: >= 8
    assert((1L to 6L).forall(got(_) == "train"))
    assert(got(7L) === "embargo")
    assert((8L to 10L).forall(got(_) == "test"))
  }

  test("byTimeEmbargo: all rows tied at the cutoff instant go to train") {
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-02 12:00:00")
    // rank ceil(0.5·6)=3 lands inside the t0 tie block → every t0 row is
    // train even though that overshoots 50%
    val ev = Seq((1L, t0), (2L, t0), (3L, t0), (4L, t0), (5L, t1), (6L, t1))
      .toDF("id", "ts")
    val got = Splits.byTimeEmbargo(ev, "ts", trainPermille = 500,
        embargo = "1 hour")
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    assert((1L to 4L).forall(got(_) == "train"))
    assert(got(5L) === "test" && got(6L) === "test")
  }

  test("byTimeEmbargo on real events: partition is exhaustive and ordered") {
    val ev = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val lab = Splits.byTimeEmbargo(ev, "ts", trainPermille = 800,
      embargo = "12 hours")
    val spans = lab.groupBy(col("split"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toMap
    val n = ev.count()
    // non-overlapping, ordered spans covering every row
    assert(spans.values.map(_._3).sum === n)
    assert(spans("train")._3 >= (n * 800 + 999) / 1000)
    if (spans.contains("embargo"))
      assert(spans("train")._2.before(spans("embargo")._1))
    if (spans.contains("test") && spans.contains("embargo"))
      assert(spans("embargo")._2.before(spans("test")._1))
    // rerun reproduces bit-for-bit
    val again = Splits.byTimeEmbargo(ev, "ts", trainPermille = 800,
      embargo = "12 hours")
    assert(lab.select("event_id", "split").exceptAll(
      again.select("event_id", "split")).isEmpty)
  }
}

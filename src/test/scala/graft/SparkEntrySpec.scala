package graft

/** Driver-contract guards: the smoke check and the queries↔oracle key
  * consistency the per-round harness depends on. */
class SparkEntrySpec extends SparkSpec {

  test("entry answers with rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle SQL key has a matching query entry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
  }

  test("every query is oracle-checked or declared-terminal Tier B — no gaps") {
    val qs = SparkEntry.queries.keySet
    val covered = SparkEntry.oracleSql.keySet ++ SparkEntry.tierB.keySet
    val gaps = qs.diff(covered)
    assert(gaps.isEmpty, s"queries with neither oracle nor Tier-B declaration: $gaps")
    // Tier-B declarations must reference real faces, and each sibling
    // must itself be oracle-checked
    SparkEntry.tierB.foreach { case (face, sibling) =>
      assert(qs.contains(face), s"tierB face $face not in queries")
      assert(SparkEntry.oracleSql.contains(sibling),
        s"tierB sibling $sibling of $face is not oracle-checked")
      assert(!SparkEntry.oracleSql.contains(face),
        s"tierB face $face also has an oracle — drop the declaration")
    }
  }

  test("q19 distinct count ignores NULL texts (SQL COUNT DISTINCT semantics)") {
    // Spark's xxhash64(NULL) returns the SEED, a non-null constant, so an
    // unguarded countDistinct(xxhash64(text)) counts NULL texts as one
    // extra distinct value per group — diverging from the DuckDB oracle
    // (r15 ADVICE, medium). Pin against a corpus with NULLs.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q19null").toString
    Seq(
      (1L, "en", Some("alpha"), 5L),
      (2L, "en", Some("alpha"), 5L),
      (3L, "en", None: Option[String], 0L),
      (4L, "en", None: Option[String], 0L),
      (5L, "de", Some("beta"), 4L))
      .toDF("doc_id", "lang", "text", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = queries.Queries.q19_doc_stats(spark, dir)
      .select($"lang", $"docs", $"distinct_docs")
      .as[(String, Long, Long)].collect()
      .map { case (l, docs, dd) => l -> ((docs, dd)) }.toMap
    assert(got("en") === ((4L, 1L)), s"NULL texts leaked into distinct: $got")
    assert(got("de") === ((1L, 1L)))
  }

  test("query names are unique and stable-format") {
    val names = (queries.Queries.queries ++ queries.ExtQueries.queries).map(_._1)
    assert(names.distinct.size === names.size)
    names.foreach(n => assert(n.matches("[a-z][a-z0-9_]+"), n))
  }
}

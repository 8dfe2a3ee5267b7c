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

  test("query names are unique and stable-format") {
    val names = (queries.Queries.queries ++ queries.ExtQueries.queries).map(_._1)
    assert(names.distinct.size === names.size)
    names.foreach(n => assert(n.matches("[a-z][a-z0-9_]+"), n))
  }
}

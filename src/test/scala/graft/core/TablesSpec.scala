package graft.core

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("registerAll exposes every testdata table as a temp view (S6) and " +
      "the SQL surface answers through them") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    Tables.all.foreach { t =>
      assert(spark.catalog.tableExists(t), s"view $t missing")
    }
    // the Athena-style SQL entry path over the registered catalog
    val top = spark.sql(
      """SELECT c_mktsegment, COUNT(DISTINCT c_custkey) AS n
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin).collect()
    assert(top.length === 5)
    assert(top.map(_.getLong(1)).sum > 0)
    // events view went through the ns→µs conversion
    val ts = spark.sql("SELECT MIN(ts) FROM events").collect().head.getTimestamp(0)
    assert(ts != null)
  }

  test("persistent registration survives a new session (Glue-catalog parity)") {
    val sfDir = "/root/testdata/sf0.001"
    // the temp-view face does NOT survive: a fresh session sees nothing
    Tables.registerAll(spark, sfDir)
    assert(!spark.newSession().catalog.tableExists("lineitem"))

    Tables.registerAll(spark, sfDir, persistent = true)
    val s2 = spark.newSession()
    Tables.prepare(s2) // the one session conf the catalog can't carry
    // no re-registration in s2 — the catalog itself answers
    Tables.all.foreach(t => assert(s2.catalog.tableExists(t), s"table $t missing"))
    assert(s2.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    // the events catalog VIEW applies the ns→µs contract in the new session
    import org.apache.spark.sql.types.TimestampType
    assert(s2.sql("SELECT ts FROM events").schema("ts").dataType === TimestampType)
    val viaCatalog = s2.sql("SELECT min(ts) AS t FROM events").head().getTimestamp(0)
    val viaLoad = Tables.load(spark, sfDir, "events")
      .agg(org.apache.spark.sql.functions.min("ts")).head().getTimestamp(0)
    assert(viaCatalog === viaLoad)
    // idempotent: re-registering replaces instead of throwing
    Tables.registerAll(spark, sfDir, persistent = true)
    assert(s2.sql("SELECT count(*) FROM region").head().getLong(0) === 5)

    // leave the shared catalog clean for other suites (qualified names so
    // the session temp views from the first test don't shadow resolution)
    spark.sql("DROP VIEW IF EXISTS spark_catalog.default.events")
    (Tables.all.filterNot(_ == "events") :+ "events_raw").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS spark_catalog.default.`$t`"))
  }
}

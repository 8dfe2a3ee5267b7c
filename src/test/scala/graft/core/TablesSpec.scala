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
}

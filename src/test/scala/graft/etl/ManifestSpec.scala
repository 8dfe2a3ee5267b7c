package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Manifest]] — partition-level publication screen. Cross-engine face
  * (portable md5 row hash) is x67_manifest. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def data: DataFrame = Seq(
    ("p1", 1L, 10L), ("p1", 2L, 20L), ("p2", 3L, 30L), ("p2", 4L, 40L))
    .toDF("part", "id", "v")

  private def m(df: DataFrame): DataFrame =
    Manifest.build(df, Seq("part"), Seq("id", "v"))

  test("fingerprint is partition-layout- and order-independent") {
    val a = m(data.repartition(1)).orderBy("part").collect().toSeq
    val b = m(data.repartition(7, col("v"))).orderBy("part").collect().toSeq
    val c = m(data.orderBy(col("id").desc)).orderBy("part").collect().toSeq
    assert(a === b && b === c)
  }

  test("diff screens exactly the touched partitions") {
    val after = data.withColumn("v",
      when(col("id") === 3L, 31L).otherwise(col("v"))) // p2 edited
      .unionByName(Seq(("p3", 9L, 90L)).toDF("part", "id", "v"))
    val got = Manifest.diff(m(data), m(after), Seq("part"))
      .as[(String, String)].collect().toSet
    assert(got === Set(("p2", "changed"), ("p3", "added")))
    // identical data -> empty diff
    assert(Manifest.diff(m(data), m(data), Seq("part")).count() === 0)
  }

  test("documented limit: duplicate-pair xor cancellation is caught by n_rows") {
    val dup = data.unionByName(
      Seq(("p1", 1L, 10L), ("p1", 1L, 10L)).toDF("part", "id", "v"))
    val before = m(data).orderBy("part").collect()
    val after = m(dup).orderBy("part").collect()
    // fingerprint unchanged (xor cancels the identical pair)...
    assert(before(0).getLong(2) === after(0).getLong(2))
    // ...but the row count moves, so the diff still flags the partition
    val got = Manifest.diff(m(data), m(dup), Seq("part"))
      .as[(String, String)].collect().toSet
    assert(got === Set(("p1", "changed")))
  }
}

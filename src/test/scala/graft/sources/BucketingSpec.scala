package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  private lazy val dir = "/root/testdata/sf0.001"

  test("co-located join of identically-bucketed tables plans no shuffle") {
    val root = Files.createTempDirectory("graft_buckets").toString
    val orders = graft.core.Tables.load(spark, dir, "orders")
    val lineitem = graft.core.Tables.load(spark, dir, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "b_orders", s"$root/o", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", s"$root/l", 8, Seq("o_orderkey"))

    // force the join strategy decision away from broadcast so the test
    // exercises the bucket-aligned sort-merge path (at real scale neither
    // side would be broadcastable anyway)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
      // join itself introduces no exchange; only the (tiny) final group-by
      val joinOnly = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
      assert(Bucketing.isShuffleFree(joinOnly),
        joinOnly.queryExecution.executedPlan.toString.linesIterator.take(30).mkString("\n"))

      // correctness: same result as the plain (shuffling) join
      val expected = orders.join(lineitem, Seq("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val root = Files.createTempDirectory("graft_buckets2").toString
    val orders = graft.core.Tables.load(spark, dir, "orders")
    Bucketing.writeBucketed(orders.select("o_orderkey", "o_totalprice"),
      "b8", s"$root/b8", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(orders.select("o_orderkey", "o_orderstatus"),
      "b4", s"$root/b4", 4, Seq("o_orderkey"))
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.colocatedJoin(spark, "b8", "b4", Seq("o_orderkey"))
      assert(j.count() === orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS b8")
      spark.sql("DROP TABLE IF EXISTS b4")
    }
  }
}

package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IncrementalQuantile]] — mergeable bottom-k sample state for
  * incremental percentile maintenance. The oracle face (portable md5
  * draw, DuckDB-reproduced sample + quantile) is x64_inc_quantile. */
class IncrementalQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, "g" + (i % 2), i.toDouble)).toDF("id", "g", "v")

  private val K = 20

  test("any batch slicing folds to the full-recompute state (mergeability)") {
    val full = IncrementalQuantile
      .sample(rows(1 to 300), Seq("g"), "v", "id", K)
      .orderBy("g", "id").collect().toSeq
    // 3-way slicing
    val s1 = IncrementalQuantile.sample(rows(1 to 100), Seq("g"), "v", "id", K)
    val s2 = IncrementalQuantile.update(s1, rows(101 to 250), Seq("g"), "v", "id", K)
    val s3 = IncrementalQuantile.update(s2, rows(251 to 300), Seq("g"), "v", "id", K)
    assert(s3.orderBy("g", "id").collect().toSeq === full)
    // different slicing, same state
    val t1 = IncrementalQuantile.sample(rows(1 to 299), Seq("g"), "v", "id", K)
    val t2 = IncrementalQuantile.update(t1, rows(300 to 300), Seq("g"), "v", "id", K)
    assert(t2.orderBy("g", "id").collect().toSeq === full)
  }

  test("state is bounded at k rows per key; reruns reproduce") {
    val s = IncrementalQuantile.sample(rows(1 to 500), Seq("g"), "v", "id", K)
    val sizes = s.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ === K.toLong))
    val again = IncrementalQuantile.sample(rows(1 to 500), Seq("g"), "v", "id", K)
    assert(s.orderBy("g", "id").collect().toSeq
      === again.orderBy("g", "id").collect().toSeq)
  }

  test("estimate tracks the exact quantile within the sampling bound") {
    // values = ids uniform on [1,2000]: true median ~1000; k=200 gives
    // rank error ~ 1/sqrt(200) ~ 7% of the range with high probability
    val data = rows(1 to 2000)
    val s = IncrementalQuantile.sample(data, Seq("g"), "v", "id", 200)
    val est = IncrementalQuantile
      .estimate(s, Seq("g"), "v", Seq(0.5))
      .as[(String, Double)].collect().toMap
    est.values.foreach(m => assert(m > 700 && m < 1300, s"median est $m"))
    // small-data exactness: k >= group size => sample IS the group, the
    // estimate is the exact interpolated percentile
    val tiny = rows(1 to 10)
    val exactState = IncrementalQuantile.sample(tiny, Seq("g"), "v", "id", 50)
    val got = IncrementalQuantile
      .estimate(exactState, Seq("g"), "v", Seq(0.5))
      .as[(String, Double)].collect().toMap
    val expect = tiny.groupBy("g")
      .agg(round(expr("percentile(v, 0.5)") + lit(1e-9), 4).as("m"))
      .as[(String, Double)].collect().toMap
    assert(got === expect)
  }
}

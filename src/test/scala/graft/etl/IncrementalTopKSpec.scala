package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IncrementalTopK]] — exact leaderboard maintenance. Cross-engine
  * face is x68_topk_state. */
class IncrementalTopKSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, "g" + (i % 2), (i * 37 % 101).toDouble))
      .toDF("id", "g", "score")

  private val K = 5

  test("any batch slicing folds to the full-recompute leaderboard") {
    val full = IncrementalTopK.build(rows(1 to 300), Seq("g"), "score", "id", K)
      .orderBy("g", "id").collect().toSeq
    val s1 = IncrementalTopK.build(rows(1 to 120), Seq("g"), "score", "id", K)
    val s2 = IncrementalTopK.update(s1, rows(121 to 260), Seq("g"), "score", "id", K)
    val s3 = IncrementalTopK.update(s2, rows(261 to 300), Seq("g"), "score", "id", K)
    assert(s3.orderBy("g", "id").collect().toSeq === full)
  }

  test("score ties break by id: deterministic kept set") {
    // many rows share score 100 (i*37%101==100): ties resolved by id asc
    val tied = (1 to 50).map(i => (i.toLong, "g", 1.0)).toDF("id", "g", "score")
    val got = IncrementalTopK.build(tied, Seq("g"), "score", "id", K)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("state bounded at k per key; a weaker delta changes nothing") {
    val st = IncrementalTopK.build(rows(1 to 200), Seq("g"), "score", "id", K)
    val weak = Seq((9999L, "g0", -1.0), (9998L, "g1", -1.0))
      .toDF("id", "g", "score")
    val after = IncrementalTopK.update(st, weak, Seq("g"), "score", "id", K)
    assert(after.orderBy("g", "id").collect().toSeq
      === st.orderBy("g", "id").collect().toSeq)
    assert(after.groupBy("g").count().as[(String, Long)]
      .collect().forall(_._2 === K.toLong))
  }
}

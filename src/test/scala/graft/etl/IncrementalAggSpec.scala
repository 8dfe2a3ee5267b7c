package graft.etl

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val all = Seq(
    ("a", 1.0), ("a", 3.0), ("a", 5.0),
    ("b", 10.0), ("b", -2.0),
    ("c", 7.0))

  test("chained delta folds equal the full recompute, any slicing") {
    val df = all.toDF("k", "x")
    val full = IncrementalAgg.aggregate(df, Seq("k"), Seq("x"))
      .orderBy("k").collect().toSeq
    // fold in three arbitrary slices — incl. key 'c' ONLY in the last delta
    val s0 = IncrementalAgg.aggregate(
      all.take(2).toDF("k", "x"), Seq("k"), Seq("x"))
    val s1 = IncrementalAgg.update(s0, all.slice(2, 4).toDF("k", "x"),
      Seq("k"), Seq("x"))
    val s2 = IncrementalAgg.update(s1, all.drop(4).toDF("k", "x"),
      Seq("k"), Seq("x"))
    assert(s2.orderBy("k").collect().toSeq === full)
  }

  test("derived mean comes from maintained state") {
    val st = IncrementalAgg.aggregate(all.toDF("k", "x"), Seq("k"), Seq("x"))
    val m = IncrementalAgg.withDerived(st, Seq("x"))
      .select("k", "mean_x").as[(String, Double)].collect().toMap
    assert(m("a") === 3.0 && m("b") === 4.0 && m("c") === 7.0)
  }

  test("merge of states is commutative") {
    val left = IncrementalAgg.aggregate(all.take(3).toDF("k", "x"), Seq("k"), Seq("x"))
    val right = IncrementalAgg.aggregate(all.drop(3).toDF("k", "x"), Seq("k"), Seq("x"))
    val ab = IncrementalAgg.merge(left, right, Seq("k"), Seq("x"))
      .orderBy("k").collect().toSeq
    val ba = IncrementalAgg.merge(right, left, Seq("k"), Seq("x"))
      .orderBy("k").collect().toSeq
    assert(ab === ba)
  }
}

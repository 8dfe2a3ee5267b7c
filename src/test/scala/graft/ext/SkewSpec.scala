package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = (
    Seq.fill(5000)(("hot", 1.0)) ++ // one dominating key
      (1 to 100).map(i => (s"k$i", i.toDouble))
  ).toDF("k", "v")

  test("salted two-phase aggregation equals plain groupBy") {
    val plain = skewed.groupBy("k")
      .agg(count("v").as("c"), sum("v").as("s"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAggregate(skewed, Seq("k"), saltFactor = 7,
        countCols = Seq("v"), sumCols = Seq("v"), minCols = Seq("v"), maxCols = Seq("v"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("v_count"), r.getAs[Double]("v_sum"),
          r.getAs[Double]("v_min"), r.getAs[Double]("v_max"))).toMap
    assert(salted === plain)
  }

  test("salted broadcast join equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("dk", "label")
    val plain = skewed.join(dim, $"k" === $"dk")
      .groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedBroadcastLeft(skewed, dim, "k", "dk", saltFactor = 5)
      .groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("H") === 5000L)
  }
}

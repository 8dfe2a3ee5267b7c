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

  test("AQE splits a skewed sort-merge join at runtime") {
    // two fact tables sharing one dominant key, forced down the SMJ path
    // with thresholds shrunk so the hot partition qualifies as skewed
    val left = (Seq.fill(20000)(1L) ++ (1L to 2000L)).toDF("k")
      .withColumn("lv", rand(7))
    val right = (Seq.fill(30)(1L) ++ (1L to 2000L)).toDF("k")
      .withColumn("rv", rand(8))
    val conf = spark.conf
    val prior = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      val joined = left.join(right, "k")
      // materialize THIS query execution so AQE finalizes its plan
      val qe = joined.queryExecution
      val n = qe.executedPlan.execute().count()
      // key 1 appears 20001 x 31 times (hot fills + the 1..2000 ranges)
      assert(n === 20001L * 31L + 1999L)
      val plan = qe.executedPlan.toString
      // AQE marked the hot partition and split it (isSkew=true in the final plan)
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"), plan.take(1500))
    } finally prior.foreach { case (k, v) => conf.set(k, v) }
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

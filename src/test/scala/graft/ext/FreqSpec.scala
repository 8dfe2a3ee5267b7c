package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FreqSpec extends SparkSpec {
  import spark.implicits._

  // skewed keyed data across two groups
  private lazy val df = (1 to 4000).map { i =>
    val k = if (i % 3 == 0) 7L else (i % 100).toLong
    (if (i % 2 == 0) "a" else "b", k)
  }.toDF("g", "k")

  test("estimates are one-sided: est >= true, within eps*N") {
    val per = Freq.sketchPerGroup(df, "g", "k", eps = 0.001)
    val merged = Freq.merge(per.select("sketch").as[Array[Byte]].collect().toSeq)
    val exact = df.groupBy("k").count().as[(Long, Long)].collect().toMap
    val n = df.count()
    for (item <- Seq(7L, 1L, 50L, 99L)) {
      val est = merged.estimateCount(java.lang.Long.valueOf(item))
      assert(est >= exact(item), s"one-sided for $item")
      assert(est <= exact(item) + (0.001 * n).ceil.toLong + 1, s"eps bound for $item")
    }
    // an absent key estimates near zero (bounded by eps*N)
    assert(merged.estimateCount(java.lang.Long.valueOf(123456L)) <= (0.001 * n).ceil.toLong + 1)
  }

  test("merged sketch is IDENTICAL to the sketch of the union") {
    val per = Freq.sketchPerGroup(df, "g", "k")
    val merged = Freq.merge(per.select("sketch").as[Array[Byte]].collect().toSeq)
    val whole = Freq.read(
      Freq.sketchPerGroup(df.withColumn("g", lit("one")), "g", "k")
        .select("sketch").as[Array[Byte]].collect().head)
    for (item <- 0L to 110L) {
      assert(merged.estimateCount(java.lang.Long.valueOf(item)) ===
        whole.estimateCount(java.lang.Long.valueOf(item)), s"item $item")
    }
  }

  test("estimateRollup emits per-group and ALL rows") {
    val per = Freq.sketchPerGroup(df, "g", "k")
    val out = Freq.estimateRollup(spark, per, Seq(7L, 1L))
      .orderBy("segment", "item")
      .as[(String, Long, Long)].collect().toSeq
    assert(out.map(_._1).distinct.sorted === Seq("ALL", "a", "b"))
    val exact7 = df.filter(col("k") === 7L).count()
    val all7 = out.find(r => r._1 == "ALL" && r._2 == 7L).get._3
    assert(all7 >= exact7 && all7 <= exact7 + 5)
  }
}

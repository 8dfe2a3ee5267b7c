package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.Pq

/** One-off calibration probe for the X90 PQ faces: measures trained-ADC
  * and shortlist-refined recall@10 across codebook sizes at a given SF dir
  * (default sf0.01, the verify scale). Results journaled in SURVEY §6.9;
  * the x90_pq_topk gate and PqSpec pins come from these numbers. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local(appName = "pq-probe")
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Pq.exactTopK(emb, queries, k = 10)
      .select("query_id", "id").as[(Long, Long)].collect().toSet

    def recall(got: Set[(Long, Long)]): Double =
      (exact intersect got).size.toDouble / exact.size

    for (k <- Seq(4, 16, 32); iters <- Seq(2, 4)) {
      val model = Pq.train(emb, m = 8, k = k, iters = iters)
      val adc = Pq.adcTopK(Pq.encodeCorpus(emb, model), queries, model, k = 10)
        .select("query_id", "id").as[(Long, Long)].collect().toSet
      val r50 = Pq.refineTopK(emb, queries, model, k = 10, shortlist = 50)
        .select("query_id", "id").as[(Long, Long)].collect().toSet
      val r100 = Pq.refineTopK(emb, queries, model, k = 10, shortlist = 100)
        .select("query_id", "id").as[(Long, Long)].collect().toSet
      println(f"n=$n k=$k%2d iters=$iters adc=${recall(adc)}%.2f " +
        f"refine50=${recall(r50)}%.2f refine100=${recall(r100)}%.2f")
    }
    spark.stop()
  }
}

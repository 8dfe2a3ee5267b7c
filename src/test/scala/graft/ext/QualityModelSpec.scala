package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[QualityModel]] — linear scoring arithmetic and threshold cut;
  * corpus face oracle-checked as x49_quality_model. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("sigmoidScore is the logistic of the weighted sum") {
    val df = Seq((2.0, 3.0)).toDF("a", "b")
    val got = df.select(QualityModel.sigmoidScore(0.5, Seq(
      QualityModel.Term("a", 1.5, col("a")),
      QualityModel.Term("b", -1.0, col("b")))).as("s"))
      .as[Double].collect().head
    val z = 0.5 + 1.5 * 2.0 - 1.0 * 3.0
    assert(math.abs(got - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
  }

  test("scoreDocs: longer well-shaped text outranks short text; keep cut") {
    val docs = Seq(
      (1L, ("word " * 200).trim, 1000L),
      (2L, "x", 1L)).toDF("doc_id", "text", "n_chars")
    val out = QualityModel.scoreDocs(docs).select("doc_id", "score", "keep")
      .as[(Long, Double, Int)].collect().sortBy(_._1)
    assert(out(0)._2 > out(1)._2)
    assert(out(0)._3 === (if (out(0)._2 >= 0.5) 1 else 0))
    assert(out(1)._3 === (if (out(1)._2 >= 0.5) 1 else 0))
  }
}

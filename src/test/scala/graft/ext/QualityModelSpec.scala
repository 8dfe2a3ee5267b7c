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

  test("fit recovers planted generating coefficients on Bernoulli data") {
    // y ~ Bernoulli(σ(-0.5 + 1.2·x1 - 0.8·x2)), n = 20000: the MLE is a
    // √n-consistent estimator, so recovered weights land within ~3 SE of
    // truth — a 0.1 margin at this n
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20000) {
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val p = 1.0 / (1.0 + math.exp(-(-0.5 + 1.2 * x1 - 0.8 * x2)))
      (if (rnd.nextDouble() < p) 1 else 0, x1, x2)
    }
    val df = rows.toDF("y", "x1", "x2").repartition(4)
    val fit = QualityModel.fit(df, col("y"),
      Seq("x1" -> col("x1"), "x2" -> col("x2")))
    assert(math.abs(fit.bias - (-0.5)) < 0.1, s"bias ${fit.bias}")
    assert(math.abs(fit.weights(0) - 1.2) < 0.1, s"w1 ${fit.weights(0)}")
    assert(math.abs(fit.weights(1) - (-0.8)) < 0.1, s"w2 ${fit.weights(1)}")
    // Newton at 8 iterations sits at the MLE: gradient numerically zero
    assert(fit.gradNorm < 1e-6, s"gradNorm ${fit.gradNorm}")
  }

  test("fit on one binary feature equals the closed-form MLE (logit of group rates)") {
    // groups: f=0 with 30/100 positives, f=1 with 70/80 positives
    val rows = Seq.fill(30)((1, 0)) ++ Seq.fill(70)((0, 0)) ++
      Seq.fill(70)((1, 1)) ++ Seq.fill(10)((0, 1))
    val df = rows.toDF("y", "f")
    val fit = QualityModel.fit(df, col("y"), Seq("f" -> col("f")))
    def logit(p: Double) = math.log(p / (1 - p))
    assert(math.abs(fit.bias - logit(0.3)) < 1e-8)
    assert(math.abs(fit.weights(0) - (logit(0.875) - logit(0.3))) < 1e-8)
  }

  test("fit is deterministic and Fit.terms feeds sigmoidScore") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500) {
      val x = rnd.nextGaussian()
      (if (rnd.nextDouble() < 1.0 / (1.0 + math.exp(-x))) 1 else 0, x)
    }
    val df = rows.toDF("y", "x")
    val feats = Seq("x" -> col("x"))
    val f1 = QualityModel.fit(df, col("y"), feats)
    val f2 = QualityModel.fit(df, col("y"), feats)
    assert(f1 === f2)
    // scoring with the fitted terms runs end to end
    val scored = df.select(QualityModel.sigmoidScore(f1.bias, f1.terms(feats)).as("s"))
      .agg(min(col("s")), max(col("s"))).as[(Double, Double)].head()
    assert(scored._1 > 0.0 && scored._2 < 1.0)
  }

  test("separable data: ridge keeps the Hessian solvable, direction correct") {
    val rows = (1 to 50).map(i => (0, -1.0 - i * 0.01)) ++
      (1 to 50).map(i => (1, 1.0 + i * 0.01))
    val fit = QualityModel.fit(rows.toDF("y", "x"), col("y"),
      Seq("x" -> col("x")), iters = 6, ridge = 1e-4)
    assert(fit.weights(0) > 0, "separating weight must be positive")
    assert(!fit.weights(0).isNaN && !fit.weights(0).isInfinite)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


import graft.functions.MomentsFunctions.vectorMoments

/** X49 — model-based quality scoring: the fastText-classifier stage of a
  * pretraining pipeline (CCNet/GPT-3-style "looks like good text" filter)
  * reduced to its engine shape — a linear model over engineered features,
  * applied row-locally at scan speed.
  *
  * The engine contract is the FEATURIZE + DOT + SIGMOID pipeline, not the
  * weights: callers bring their trained coefficients (a fastText model's
  * hidden layer collapses to exactly this form for inference over hashed
  * n-gram features). Everything is a codegen'd Column expression — no
  * UDF, no shuffle, no model server round-trip; 100 TB scoring is one
  * scan at memory bandwidth.
  */
object QualityModel {

  /** A named model term: weight × feature expression. */
  case class Term(name: String, weight: Double, expr: Column)

  /** logistic(bias + Σ wᵢ·fᵢ) as a Column. */
  def sigmoidScore(bias: Double, terms: Seq[Term]): Column = {
    val z = terms.foldLeft(lit(bias)) { (acc, t) =>
      acc + lit(t.weight) * t.expr
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** The pinned documents-table model (weights chosen to separate the
    * synthetic corpus sensibly; the CONTRACT under test is the scoring
    * arithmetic, which the x49 oracle reproduces in SQL): length
    * log-features + token shape. */
  def documentTerms(text: Column, nChars: Column): Seq[Term] = Seq(
    Term("log_tokens", 0.9, log(lit(1.0) + TextStats.tokenCount(text))),
    Term("mean_token_len", 0.35, TextStats.meanTokenLength(text)),
    Term("log_chars", -0.25, log(lit(1.0) + nChars)))

  /** Score `df` rows and label keep = (rounded score ≥ threshold); the
    * round-then-compare keeps the cut ulp-stable across engines. */
  def scoreDocs(df: DataFrame, textCol: String = "text",
      nCharsCol: String = "n_chars", bias: Double = -3.0,
      threshold: Double = 0.5): DataFrame = {
    val s = round(sigmoidScore(bias,
      documentTerms(col(s"`$textCol`"), col(s"`$nCharsCol`"))), 4)
    df.withColumn("score", s)
      .withColumn("keep", (col("score") >= threshold).cast("int"))
  }

  /** A fitted model: bias + per-feature weights, with convergence
    * diagnostics. [[terms]] turns it straight back into the scoring form. */
  final case class Fit(bias: Double, weights: IndexedSeq[Double],
      names: IndexedSeq[String], gradNorm: Double, iters: Int) {
    def terms(features: Seq[(String, Column)]): Seq[Term] = {
      require(features.map(_._1) == names,
        s"feature names ${features.map(_._1)} != fitted $names")
      features.zip(weights).map { case ((n, e), w) => Term(n, w, e) }
    }
  }

  /** X49 (round 9) — TRAIN the quality model, not just score it:
    * distributed logistic regression by Newton / IRLS.
    *
    * Each iteration is ONE aggregation scan that reuses the
    * [[graft.functions.VectorMoments]] kernel twice over the augmented
    * feature vector x = [1, f₁ … f_d] (bias folded in as the constant
    * feature):
    *  - gradient  ∇ = Σ (σ(wᵀx) − y)·x  — the `sums` of the vector
    *    (σ−y)·x (its `prods` are discarded);
    *  - Hessian   H = Σ σ(1−σ)·x xᵀ     — the `prods` of the vector
    *    √(σ(1−σ))·x, since (√s·x)(√s·x)ᵀ = s·x xᵀ.
    * Per-row arithmetic is codegen'd builtin HOFs (zip_with/aggregate
    * dot product, let-bound once); the driver receives
    * O(d²) doubles per iteration — never rows — and takes the damped
    * Newton step w ← w − (H + λI)⁻¹∇ (Gaussian elimination on a d+1
    * matrix that fits in cache). Deterministic: zero init, fixed
    * iteration count, ridge λ for separable data (where the unpenalized
    * MLE diverges). Newton converges quadratically: 8 iterations reach
    * machine precision for well-conditioned engineered features
    * (standardize or log-scale heavy-tailed ones, as [[documentTerms]]
    * already does).
    *
    * Verified two ways: QualityModelSpec recovers planted generating
    * coefficients on synthetic Bernoulli data, and the x49_fit face
    * oracle-checks the full distributed path against the CLOSED-FORM
    * MLE — on a single binary feature the optimum is exactly
    * logit(rate₁) − logit(rate₀), which DuckDB computes from group
    * rates.
    *
    * @param label 0/1 (or boolean) label column
    * @param features (name, expression) pairs; expressions must be
    *   non-null finite doubles
    * @return fitted bias/weights + a convergence diagnostic: `gradNorm`
    *   is the gradient norm at the START of the LAST iteration (the
    *   penultimate iterate — the returned weights are one Newton step
    *   past it, so the diagnostic lags one step; near the MLE it bounds
    *   the final norm from above by quadratic convergence, and
    *   recomputing at the returned weights would cost one extra full
    *   scan for a number only read by humans) */
  def fit(df: DataFrame, label: Column, features: Seq[(String, Column)],
      iters: Int = 8, ridge: Double = 1e-8): Fit = {
    require(features.nonEmpty, "at least one feature")
    val d = features.size + 1
    val x = array((lit(1.0) +: features.map(_._2.cast("double"))): _*)
    val y = label.cast("double")
    var w = Array.fill(d)(0.0)
    var gradNorm = Double.NaN
    var it = 0
    while (it < iters) {
      val wLit = typedlit(w.toIndexedSeq)
      // σ in a projection BELOW the aggregation (computed once per row,
      // codegen'd); the two moment aggregates above it share the scan
      val gh = df.select(x.as("x"), y.as("y"))
        .withColumn("sig", lit(1.0) / (lit(1.0) + exp(-aggregate(
          zip_with(col("x"), wLit, (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v))))
        .select(
          vectorMoments(transform(col("x"),
            xi => (col("sig") - col("y")) * xi)).as("g"),
          vectorMoments(transform(col("x"),
            xi => sqrt(col("sig") * (lit(1.0) - col("sig"))) * xi)).as("h"))
        .select(col("g.sums").as("g"), col("h.prods").as("h"))
        .head()
      val g = gh.getSeq[Double](0).toArray
      val hUt = gh.getSeq[Double](1).toArray
      // unpack upper-triangular Hessian + ridge
      val h = Array.ofDim[Double](d, d)
      var t = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          h(i)(j) = hUt(t); h(j)(i) = hUt(t); t += 1; j += 1
        }
        h(i)(i) += ridge
        i += 1
      }
      val step = solve(h, g)
      i = 0
      while (i < d) { w(i) -= step(i); i += 1 }
      gradNorm = math.sqrt(g.map(v => v * v).sum)
      it += 1
    }
    Fit(w(0), w.drop(1).toIndexedSeq, features.map(_._1).toIndexedSeq,
      gradNorm, iters)
  }

  /** Gaussian elimination with partial pivoting (d ≤ a few hundred —
    * engineered-feature counts; the Hessian is SPD + ridge so pivots
    * never vanish). */
  private def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val d = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col = 0
    while (col < d) {
      var p = col
      var r = col + 1
      while (r < d) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      if (p != col) { val tr = a(p); a(p) = a(col); a(col) = tr
        val tb = b(p); b(p) = b(col); b(col) = tb }
      val piv = a(col)(col)
      require(math.abs(piv) > 1e-300, "singular Hessian (add ridge)")
      r = col + 1
      while (r < d) {
        val f = a(r)(col) / piv
        if (f != 0.0) {
          var c = col
          while (c < d) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val xOut = new Array[Double](d)
    var i = d - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < d) { s -= a(i)(j) * xOut(j); j += 1 }
      xOut(i) = s / a(i)(i)
      i -= 1
    }
    xOut
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}

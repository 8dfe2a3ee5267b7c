package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.letCol

/** X3 extension — int8 embedding quantization (the storage/bandwidth lever
  * for ANN at scale: a 4-byte float vector element becomes 1 byte plus one
  * shared scale, so a 100 TB float corpus ships and caches at ~25 TB with
  * ~0.3% cosine error on typical embeddings).
  *
  * Symmetric per-vector scheme: scale = max|v| / 127, q_i = round(v_i /
  * scale) ∈ [−127, 127], dequant v̂_i = q_i · scale. All pure builtin
  * array expressions — the scale is let-bound ([[letCol]]) so the
  * array_max does NOT re-evaluate per element (the Catalyst HOF
  * re-evaluation trap).
  */
object Quantize {

  /** The double-widened value array (float inputs widen BEFORE any
    * arithmetic — float ops round per-step and diverge from a
    * double-computing oracle). */
  private def widened(vec: Column): Column = transform(vec, _.cast("double"))

  /** scale = max|v|/127, floored at 1e-30 so an all-zero vector keeps a
    * well-defined scale (and quantizes to all zeros). */
  def scaleOf(vec: Column): Column =
    greatest(array_max(transform(widened(vec), x => abs(x))), lit(1e-30)) / 127.0

  /** array<long> of quantized values in [−127, 127] (long for exact
    * downstream integer arithmetic; cast to tinyint at the storage edge). */
  def quantized(vec: Column, scale: Column): Column =
    transform(widened(vec), x => round(x / scale).cast("long"))

  /** Dequantized double array. */
  def dequantized(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)

  /** Append `qvec` (array<long>) + `qscale` (double) columns. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val vec = col(s"`$vecCol`")
    df.withColumn("__q", letCol(scaleOf(vec))(s =>
        struct(s.as("qscale"), quantized(vec, s).as("qvec"))))
      .withColumn("qscale", col("__q.qscale"))
      .withColumn("qvec", col("__q.qvec"))
      .drop("__q")
  }

  /** Cosine similarity computed on dequantized vectors — the quality probe
    * for the quantization error (spec asserts it tracks exact cosine). */
  def dequantCosine(qa: Column, sa: Column, qb: Column, sb: Column): Column = {
    val a = dequantized(qa, sa)
    val b = dequantized(qb, sb)
    letCol(aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)) { dot =>
      letCol(sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _)) *
        sqrt(aggregate(transform(b, x => x * x), lit(0.0), _ + _))) { norms =>
        when(norms === 0.0, lit(0.0)).otherwise(dot / norms)
      }
    }
  }
}

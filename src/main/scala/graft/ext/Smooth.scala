package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** X52 — exponentially-weighted moving average per key (the smoothing
  * primitive of telemetry dashboards and drift/anomaly baselines;
  * pandas' `ewm(adjust=False)`, which Spark has no native analog for).
  *
  * y₀ = x₀; yᵢ = α·xᵢ + (1−α)·yᵢ₋₁ — an inherently SEQUENTIAL per-key
  * recurrence, so this is the documented `mapPartitions` case (SURVEY
  * §2.8 preference order (d)): no Column-algebra composition computes a
  * data-dependent recurrence, and the closed-form prefix-sum rewrite
  * (Σ (1−α)^(i−j)·xⱼ via cumsum of xⱼ/(1−α)^j) overflows the double
  * range beyond ~700 rows per key, silently — wrong tool at scale.
  *
  * Plan shape, 100 TB reading: ONE hash shuffle on the key
  * (`repartition`), keys sorted WITHIN partitions together with their
  * timestamps (`sortWithinPartitions` — Spark's spillable external sort,
  * no per-key buffering), then a single forward pass per partition
  * carrying O(1) state (current key + running value). Parallelism =
  * distinct keys spread over partitions; a single key's series is
  * processed by one task sequentially — the recurrence's intrinsic
  * critical path, same as any engine.
  */
object Smooth {

  /** Append `ewma` to (keyCol, tsCol, valueCol) rows. Rows with null
    * value pass through with a null ewma and do NOT advance the state
    * (pandas `ignore_na=True` semantics). Ties on (key, ts) are ordered
    * by the value column to keep the scan deterministic. `carryCols`
    * ride along unexamined (per-row attributes downstream consumers
    * need — avoids a fan-out-prone re-join on non-unique triples). */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      alpha: Double, carryCols: Seq[String] = Nil): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    val in = df.select(col(s"`$keyCol`") +: col(s"`$tsCol`") +:
      col(s"`$valueCol`").cast("double").as(valueCol) +:
      carryCols.map(c => col(s"`$c`")): _*)
    val outSchema = StructType(in.schema.fields :+
      StructField("ewma", DoubleType, nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val keyIdx = 0; val valIdx = 2

    in.repartition(col(s"`$keyCol`"))
      .sortWithinPartitions(
        col(s"`$keyCol`"), col(s"`$tsCol`"), col(s"`$valueCol`"))
      .mapPartitions { rows =>
        var curKey: Any = new AnyRef // sentinel unequal to any key value
        var state = 0.0
        var hasState = false
        rows.map { r =>
          val k = r.get(keyIdx)
          if (k != curKey) { curKey = k; hasState = false }
          val out =
            if (r.isNullAt(valIdx)) null
            else {
              val x = r.getDouble(valIdx)
              state = if (!hasState) x else alpha * x + (1 - alpha) * state
              hasState = true
              java.lang.Double.valueOf(state)
            }
          Row.fromSeq(r.toSeq :+ out)
        }
      }(enc)
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions
import graft.functions.ColumnOps.letCol

/** Ingest-time benchmark-contamination screen: the streaming face of
  * [[graft.ext.Contamination]] — flag documents whose word-n-gram overlap
  * with a held-out eval set exceeds a threshold AS THEY ARRIVE, before
  * they ever land in the training corpus (the batch screen audits after
  * the fact; a pipeline that ingests continuously wants the gate at the
  * door).
  *
  * Shape: [[fit]] folds the benchmark's distinct gram hashes into a Bloom
  * bitset ONCE (benchmarks are MBs — one driver-held byte array), and
  * [[screen]] is a PURE ROW-LOCAL PROJECTION over it: grams built with
  * array HOFs, each probed through the codegen'd
  * [[graft.functions.BloomMightContain]] straight off the literal bytes.
  * No state store, no watermark, no aggregation, no join — the screen
  * runs identically on a batch frame and on every micro-batch of a
  * stream, and restarts/replays are trivially idempotent because there
  * is nothing to accumulate.
  *
  * Exactness contract: a Bloom probe has NO false negatives, so a
  * contaminated document is never missed; false positives can only
  * INFLATE a document's overlap ratio — the conservative direction for a
  * decontamination gate (size the bitset for the benchmark's gram count
  * to keep the inflation negligible; the spec pins exact agreement with
  * the batch screen at the default sizing). Documents shorter than n
  * tokens have no grams: the gate KEEPS their row with ratio 0, never
  * flagged — a gate must emit a verdict for every arriving document.
  * This deliberately DIFFERS from the batch
  * [[graft.ext.Contamination.report]], which (like a SQL GROUP BY over
  * an empty gram set) emits no row for them; the x4_contam_gate oracle
  * left-joins the full doc set so the ratio-0 contract is pinned
  * cross-engine rather than coincidental.
  */
object StreamingContamination {

  /** Benchmark gram hashes → Bloom bitset bytes (one small driver value).
    * `numBits` defaults to 1 M bits = 128 KB — comfortable for eval sets
    * up to ~50 k distinct grams at numHashes = 4. */
  def fit(bench: DataFrame, idCol: String, textCol: String, n: Int = 3,
      numBits: Int = 1 << 20, numHashes: Int = 4): Array[Byte] =
    graft.ext.Contamination.ngramHashes(bench, idCol, textCol, n)
      .agg(BloomFunctions.bloomBuild(col("gram"), numBits, numHashes)
        .as("bloom"))
      .head().getAs[Array[Byte]]("bloom")

  /** Row-local distinct gram hashes of a text column (the HOF mirror of
    * the batch screen's explode+distinct — tokens never leave the row). */
  private def gramHashes(text: Column, n: Int): Column =
    letCol(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)) {
      toks =>
        array_distinct(
          when(size(toks) >= n,
            transform(sequence(lit(1), size(toks) - (n - 1)),
              i => xxhash64(concat_ws(" ", slice(toks, i, lit(n))))))
            .otherwise(array().cast("array<bigint>")))
    }

  /** Adds (n_grams, n_hit, ratio, contaminated) to `docs` — batch or
    * streaming; `maxRatio` is the gate (flagged when ratio > maxRatio). */
  def screen(docs: DataFrame, bloom: Array[Byte], textCol: String,
      n: Int = 3, numHashes: Int = 4, maxRatio: Double = 0.1,
      roundTo: Int = 4): DataFrame = {
    val bloomLit = lit(bloom)
    docs
      .withColumn("__grams", gramHashes(col(textCol), n))
      .withColumn("__hits", filter(col("__grams"),
        g => BloomFunctions.bloomMightContain(bloomLit, g, numHashes)))
      .select(docs.columns.map(c => col(s"`$c`"))
        :+ size(col("__grams")).cast("long").as("n_grams")
        :+ size(col("__hits")).cast("long").as("n_hit")
        :+ when(size(col("__grams")) > 0,
            round(size(col("__hits")).cast("double") / size(col("__grams"))
              + lit(1e-9), roundTo)).otherwise(0.0).as("ratio"): _*)
      .withColumn("contaminated", col("ratio") > maxRatio)
  }
}

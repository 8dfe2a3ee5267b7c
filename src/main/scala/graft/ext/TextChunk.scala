package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.letCol

/** Training-sequence preparation operators (X4 family).
  *
  * Chunking splits documents into fixed-token windows (with optional
  * overlap) — the standard pre-tokenization packing step. One narrow
  * projection + posexplode per document: no shuffle, parallel across the
  * corpus, and the per-document work is O(tokens).
  */
object TextChunk {

  /** Token windows of `maxTokens` with `overlap` tokens carried between
    * consecutive chunks. Output: one row per chunk with (chunk_idx,
    * chunk_text, chunk_tokens). Empty docs produce no rows. */
  def chunkTokens(df: DataFrame, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > overlap,
      s"maxTokens ($maxTokens) must exceed overlap ($overlap)")
    val stride = maxTokens - overlap
    val chunks = letCol(TextStats.tokens(col(s"`$textCol`"))) { toks =>
      when(size(toks) === 0, array().cast("array<string>"))
        .otherwise(transform(
          // window starts: 0, stride, 2·stride, … while start < size
          // (Column `/` is double division — floor+cast for the int count)
          sequence(lit(0), floor((size(toks) - 1) / stride).cast("int")),
          w => concat_ws(" ", slice(toks, w * stride + 1, lit(maxTokens)))))
    }
    df.withColumn("__chunks", chunks)
      .select((df.columns.map(col) :+
        posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text"))): _*)
      .withColumn("chunk_tokens", TextStats.tokenCount(col("chunk_text")).cast("long"))
      .drop("__chunks")
  }
}

/** Deterministic weighted mixing of training sources: each source is
  * hash-threshold-sampled to its ratio and tagged, then unioned. No RNG
  * state, no shuffle beyond the union — re-running yields the identical
  * mix, and per-source lineage is preserved in `mix_source`. */
object Mixing {

  /** @param sources  (name → (df, keepFraction in [0,1])); all DataFrames
    *                 must share the schema of the first
    * @param keyCol   column hashed for the sampling decision (stable id)
    * @param drawHash optional per-source draw in [0, 10000): given the
    *                 source name, return the hash column to threshold.
    *                 Default is the engine-native xxhash64 draw; the
    *                 x7_weighted_mix oracle face passes the portable
    *                 md5-52-bit draw so DuckDB reproduces the identical
    *                 mix (the x54/x60 pattern). */
  def weightedUnion(sources: Seq[(String, (DataFrame, Double))],
      keyCol: String,
      drawHash: Option[String => org.apache.spark.sql.Column] = None): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (name, (df, frac)) =>
      require(frac >= 0 && frac <= 1, s"fraction for $name out of range: $frac")
      // round, don't truncate: 0.29 * 10000 is 2899.999… in binary — toLong
      // would keep 28.99% instead of the requested 29%
      val threshold = math.round(frac * 10000)
      val draw = drawHash.map(f => f(name))
        .getOrElse(pmod(xxhash64(col(s"`$keyCol`"), lit(name)), lit(10000L)))
      df.filter(draw < threshold)
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }
}

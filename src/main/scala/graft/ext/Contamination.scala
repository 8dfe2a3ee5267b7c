package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: for every corpus document, the share
  * of its word n-grams that also occur anywhere in a benchmark/eval set —
  * the standard decontamination screen a training-data pipeline runs
  * before a model ever sees the corpus (n-gram overlap against held-out
  * benchmarks; the reference has no analog — this is a §2.8 north-star
  * operator).
  *
  * Scale design (100 TB corpus, small benchmark set):
  *  - n-grams are built PER ROW with array higher-order functions
  *    (`filter`/`transform`/`sequence`/`slice`) — all codegen'd builtins,
  *    no UDF, no explode-then-window (a window over tokenized positions
  *    would shuffle every token by doc; here tokens never leave their row).
  *  - only 64-bit `xxhash64` gram fingerprints leave the row, never gram
  *    text: the exploded relation is (id, long), 12 bytes a pair, and the
  *    benchmark side reduces to a DISTINCT long set.
  *  - benchmark gram sets are small by nature (eval suites are MBs, not
  *    TBs) ⇒ the membership probe is a broadcast left join; if a giant
  *    "benchmark" is ever used, AQE falls back to a shuffled hash join on
  *    the same plan. Distinct-ing the corpus grams first bounds the join
  *    input at one row per (doc, distinct gram).
  *
  * Exactness: results are exact up to xxhash64 collisions between
  * DISTINCT grams (~n²/2⁶⁴; for a 10¹²-gram corpus the expected collision
  * count is < 0.1, and a collision can only ever OVER-count overlap by
  * one gram). The oracle-checked query (`x4_contamination`) matches a
  * string-space DuckDB computation exactly on the test corpus.
  */
object Contamination {

  /** Lowercased alphanumeric tokens (runs of [a-z0-9] after lower()). */
  private def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => length(t) > 0)

  /** One row per DISTINCT word n-gram per document: (idCol, gram) with
    * gram = xxhash64 of the space-joined n tokens. Documents shorter than
    * n tokens contribute no rows. */
  def ngramHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val toks = tokens(col(textCol))
    // sequence(a, b) REVERSES when b < a — guard the too-short case with
    // an empty gram array instead.
    // NOTE (r17): SpanDedup's multi-arg-xxhash64 gram kernel (1.7× on the
    // hash stage) was tried here and REVERTED. This helper feeds
    // StreamingContamination.fit's BLOOM FILTER, whose behavior depends
    // on the hash VALUES (bit positions → false-positive pattern), not
    // just the gram-equivalence classes — changing the values re-rolls
    // the FP dice against the exact string-space oracle of
    // x4_contam_gate, and the screen's row-local gramHashes must stay
    // value-identical to this expression (measured: a mismatched pair
    // flags nothing). The batch report path is class-only and would be
    // safe, but splitting the "shared verbatim" kernel in two is not
    // worth the non-bench-row win.
    val grams = when(size(col("__toks")) >= n,
      transform(
        sequence(lit(1), size(col("__toks")) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(col("__toks"), i, lit(n))))))
      .otherwise(array().cast("array<bigint>"))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), explode(grams).as("gram"))
      .distinct()
  }

  /** Per-corpus-document contamination report against a benchmark set.
    *
    * @return (idCol, n_grams, n_hit, ratio): distinct n-grams in the
    *         document, how many also occur in ANY benchmark document, and
    *         their ratio (0.0 for gram-less docs is undefined → such docs
    *         have no row, mirroring SQL GROUP BY over an empty gram set).
    */
  def report(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 3, roundTo: Int = 4): DataFrame = {
    val corpusGrams = ngramHashes(corpus, idCol, textCol, n)
    val benchGrams = ngramHashes(bench, idCol, textCol, n)
      .select(col("gram")).distinct().withColumn("__hit", lit(1L))
    corpusGrams
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .withColumn("ratio",
        round(col("n_hit").cast("double") / col("n_grams") + lit(1e-9), roundTo))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.letCol

/** X42 — skip-gram co-occurrence counts: the embedding-training prep pass
  * (GloVe's cooccurrence matrix, word2vec's positive pairs, PMI inputs).
  * For every document, every ordered token pair within `window` positions
  * contributes one observation; output is one row per UNORDERED pair
  * (canonical `wa <= wb`) with the raw count and the distance-discounted
  * weight Σ 1/distance (GloVe's weighting), corpus-wide.
  *
  * Shape (100 TB): pair generation is ROW-LOCAL — builtin `sequence` /
  * `transform` HOFs over the let-bound token array emit the O(L·window)
  * pairs inside the scan projection, so the only shuffle is the final
  * pair-keyed groupBy, partial-aggregated map-side (hot pairs — stopword
  * bigrams — collapse before the wire, the same algebraic-count argument
  * as [[LineDedup]]'s hashed counting). No self-join of a token table on
  * the Spark side; the join formulation is what the DuckDB oracle runs,
  * which is exactly the cross-check one wants.
  *
  * Vocabulary pruning (`minTermCount`): pairs whose EITHER endpoint
  * occurs fewer than `minTermCount` times corpus-wide are dropped, via
  * semi-joins against the (broadcastable, post-prune) vocabulary.
  * Contract pinned by the spec: windows span ORIGINAL token positions —
  * a pruned token still occupies its slot, it just forms no pairs
  * (dropping it and re-compacting would manufacture co-occurrences
  * between words that never stood near each other).
  */
object Cooccur {

  /** Row-local pair array: struct(wa, wb, dist) per in-window pair. */
  private def pairArray(tokens: Column, window: Int): Column =
    letCol(tokens) { tk =>
      val n = size(tk)
      flatten(transform(sequence(lit(0), n - 2), i =>
        transform(sequence(i + 1, least(i + lit(window), n - 1)), j =>
          struct(
            least(element_at(tk, i + 1), element_at(tk, j + 1)).as("wa"),
            greatest(element_at(tk, i + 1), element_at(tk, j + 1)).as("wb"),
            (j - i).cast("int").as("dist")))))
    }

  /** Corpus-wide co-occurrence table: (wa, wb, n, wsum) with wa <= wb,
    * `n` the pair observation count and `wsum` = Σ 1/distance. */
  def pairCounts(docs: DataFrame, textCol: String = "text", window: Int = 2,
      minTermCount: Long = 1L): DataFrame = {
    require(window >= 1, "window >= 1")
    val toks = TextStats.tokens(col(s"`$textCol`"))
    val pairs = docs
      .filter(size(toks) >= 2)
      .select(explode(pairArray(toks, window)).as("p"))
      .select(col("p.wa"), col("p.wb"), col("p.dist"))
    val kept =
      if (minTermCount <= 1L) pairs
      else {
        val vocab = docs
          .select(explode(TextStats.tokens(col(s"`$textCol`"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= minTermCount)
          .select(col("w"))
        pairs
          .join(broadcast(vocab).withColumnRenamed("w", "wa"), Seq("wa"), "left_semi")
          .join(broadcast(vocab).withColumnRenamed("w", "wb"), Seq("wb"), "left_semi")
      }
    kept
      .groupBy(col("wa"), col("wb"))
      .agg(count(lit(1)).as("n"),
        sum(lit(1.0) / col("dist")).as("wsum"))
  }
}

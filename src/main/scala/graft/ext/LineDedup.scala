package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X36 — corpus-wide LINE deduplication (SURVEY §2.8), the classic
  * web-corpus cleaning pass: a line that repeats across more than
  * `maxOccurrences` documents is boilerplate (navigation, cookie banners,
  * headers/footers, license blurbs) and is removed from EVERY document,
  * while each document's unique prose is kept in order.
  *
  * This is deliberately different from document-level dedup (X1/X2): the
  * unit of repetition is the line, the survivor set is per-document, and a
  * document is dropped only when nothing survives.
  *
  * Scale shape (the 100 TB contract — since r16, no line text on any
  * shuffle):
  *   - (doc, pos, line-hash) rows are exploded once
  *     (`posexplode(split(text, '\n', -1))`, hashed in the row) and
  *     counted by the 8-byte hash — the count shuffle moves 16 bytes per
  *     line, never line text, and map-side partial aggregation collapses
  *     within-partition repeats before the exchange;
  *   - the heavy set (count > threshold) is tiny by construction —
  *     boilerplate is the head of the line-frequency distribution — so the
  *     removal test is a BROADCAST join on the hash;
  *   - only the MATCHED (doc, pos) rows — the boilerplate occurrences —
  *     are shuffled into a per-document removed-position list;
  *   - reassembly is ROW-LOCAL on docs ⟕ removed: filter the row's own
  *     line array by position, re-join with '\n'. No per-line shuffle of
  *     surviving text, no collect_list of the corpus (the pre-r16 shape
  *     moved every surviving line through a doc-keyed exchange to
  *     reassemble; the decision only ever needed hashes and positions —
  *     guide §8).
  *
  * Hashing note: counting by xxhash64 rather than the line text makes a
  * collision (two DISTINCT lines sharing a 64-bit hash, one of them
  * boilerplate) remove an innocent line. With B boilerplate lines and D
  * distinct lines the probability any such pair exists is ≈ B·D / 2^64 —
  * at a trillion distinct lines and 10^6 boilerplate lines, ~5·10^-8.
  * The oracle-facing query (x36_line_dedup) hash-matches DuckDB's EXACT
  * line-text counting on real data, which pins that the hashed plan
  * computes the exact semantics absent collisions.
  */
object LineDedup {

  /** Documents with corpus-frequent lines removed.
    *
    * @param docs           input corpus
    * @param idCol          document key column (must key rows)
    * @param textCol        text column; lines are '\n'-separated
    * @param maxOccurrences lines occurring MORE than this many times
    *                       across the corpus are removed
    * @return (idCol, textCol) with cleaned text, documents whose every
    *         line was boilerplate omitted
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Long): DataFrame = {
    require(maxOccurrences >= 1, "threshold must be >= 1")
    import graft.functions.ColumnOps.letCol

    val lineArr: Column = split(col(textCol), "\n", -1)
    val lines = docs.select(
      col(idCol),
      posexplode(transform(lineArr, l => xxhash64(l)))
        .as(Seq("__pos", "__lh")))

    val heavy = lines
      .groupBy(col("__lh"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > maxOccurrences)
      .select("__lh")

    // boilerplate occurrences only: (doc, removed positions) — bounded by
    // heavy-line hits, tiny next to the corpus
    val removed = lines
      .join(broadcast(heavy), Seq("__lh"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos"))).as("__rp"))

    // row-local rebuild: keep lines whose position is not removed. The
    // survival test is "any line left", NOT "text non-empty" — a document
    // whose sole surviving line is the empty string stays (with empty
    // text), exactly as the pre-r16 groupBy emitted it.
    docs.join(removed, Seq(idCol), "left")
      .select(col(idCol), col(textCol), col("__rp"))
      .withColumn(textCol,
        letCol(coalesce(col("__rp"), array().cast("array<int>"))) { rp =>
          filter(lineArr, (_, i) => not(array_contains(rp, i)))
        })
      .filter(size(col(textCol)) > 0)
      .select(col(idCol), array_join(col(textCol), "\n").as(textCol))
  }

  /** The corpus-frequency table itself (line text, occurrences), for
    * inspection/reporting: exact text counting, so only use on corpora
    * where shuffling distinct line text is acceptable — or pre-filter.
    * The main path above never calls this. */
  def lineFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\n", -1)).as("line"))
      .groupBy("line").agg(count(lit(1)).as("occurrences"))
}

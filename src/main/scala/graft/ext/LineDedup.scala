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
  * Scale shape (the 100 TB contract):
  *   - lines are exploded once (`posexplode(split(text, '\n', -1))`) and
  *     counted by `xxhash64(line)` — the count shuffle moves 16 bytes per
  *     line, never line text, and map-side partial aggregation collapses
  *     within-partition repeats before the exchange;
  *   - the heavy set (count > threshold) is tiny by construction —
  *     boilerplate is the head of the line-frequency distribution — so the
  *     removal is a BROADCAST left-anti join on the hash;
  *   - reassembly is one `groupBy(doc)` with a row-local
  *     `array_sort(collect_list(struct(pos, line)))` — per-document state
  *     is bounded by document size, which is bounded in any sane corpus.
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
    * @param idCol          document key column
    * @param textCol        text column; lines are '\n'-separated
    * @param maxOccurrences lines occurring MORE than this many times
    *                       across the corpus are removed
    * @return (idCol, textCol) with cleaned text, documents whose every
    *         line was boilerplate omitted
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      maxOccurrences: Long): DataFrame = {
    require(maxOccurrences >= 1, "threshold must be >= 1")
    val lines = docs.select(
      col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos", "__line")))

    val heavy = lines
      .groupBy(xxhash64(col("__line")).as("__lh"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > maxOccurrences)
      .select("__lh")

    lines
      .join(broadcast(heavy), xxhash64(col("__line")) === col("__lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(rebuild(col("__pos"), col("__line")).as(textCol))
  }

  /** Surviving (pos, line) pairs back to ordered newline-joined text —
    * row-local array HOFs, nothing leaves the row after the groupBy. */
  private def rebuild(pos: Column, line: Column): Column =
    array_join(
      transform(
        array_sort(collect_list(struct(pos.as("p"), line.as("l")))),
        x => x.getField("l")),
      "\n")

  /** The corpus-frequency table itself (line text, occurrences), for
    * inspection/reporting: exact text counting, so only use on corpora
    * where shuffling distinct line text is acceptable — or pre-filter.
    * The main path above never calls this. */
  def lineFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\n", -1)).as("line"))
      .groupBy("line").agg(count(lit(1)).as("occurrences"))
}

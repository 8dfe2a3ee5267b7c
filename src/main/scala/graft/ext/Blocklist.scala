package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnOps.letCol

/** X74 — phrase-blocklist screen: the C4-style "bad words" pass — drop or
  * flag documents containing any phrase from a curated list, matched on
  * TOKEN BOUNDARIES (the C4 paper's rule: "washcloth" must not trip a
  * blocklist entry "wash"; substring LIKE-matching does exactly that
  * false positive, which is why the match unit is the word n-gram).
  *
  * Shape: pure row-local projection, zero shuffle — the phrase list is
  * grouped by token length driver-side, the document is tokenized ONCE
  * (lower + non-alphanumeric split, the X15 kernel), and for each length
  * L present in the list the doc's distinct L-grams are intersected with
  * that length's phrase literal (`array_intersect` hash-sets the literal
  * per row: O(|grams| + |phrases|), no nested loop). A 100 TB corpus
  * screens at scan speed; the blocklist (hundreds to a few thousand
  * entries — C4's is ~400) rides into codegen as array literals.
  *
  * Counting contract: `n_blocked` counts DISTINCT blocklist phrases
  * present (not occurrence multiplicity — a doc repeating one slur 100
  * times and a doc matching 100 different entries are different signals,
  * and the latter is the stronger removal evidence); `blocked` is
  * n_blocked > 0. Phrases are normalized through the SAME tokenizer as
  * the documents, so list-side punctuation/case can't cause misses.
  */
object Blocklist {

  /** Lowercased alphanumeric tokens (runs of [a-z0-9] after lower()) —
    * the X15 contamination kernel's tokenizer, shared verbatim. */
  private def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => length(t) > 0)

  /** Normalize a phrase exactly like document text: lowercase, split on
    * non-alphanumerics, space-join. Empty result (punctuation-only
    * phrase) is dropped by [[screen]]. */
  def normalizePhrase(p: String): String =
    p.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).mkString(" ")

  /** Adds (n_blocked, blocked) to `docs`. `phrases` is the blocklist in
    * any case/punctuation; matching is on normalized token n-grams. */
  def screen(docs: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame = {
    docs.withColumn("n_blocked", hitCount(textCol, phrases).cast("long"))
      .withColumn("blocked", col("n_blocked") > 0)
  }

  /** Distinct-phrase hit count expression (the row-local kernel shared
    * by [[screen]] and [[filterBlocked]]). */
  private def hitCount(textCol: String, phrases: Seq[String]): Column = {
    val byLen: Seq[(Int, Seq[String])] = phrases.map(normalizePhrase)
      .filter(_.nonEmpty).distinct
      .groupBy(_.count(_ == ' ') + 1).toSeq.sortBy(_._1)
    require(byLen.nonEmpty, "blocklist is empty after normalization")
    letCol(tokens(col(s"`$textCol`"))) { toks =>
      byLen.map { case (n, ps) =>
        val grams =
          if (n == 1) array_distinct(toks)
          else array_distinct(
            when(size(toks) >= n,
              transform(sequence(lit(1), size(toks) - (n - 1)),
                i => concat_ws(" ", slice(toks, i, lit(n)))))
              .otherwise(array().cast("array<string>")))
        size(array_intersect(grams, lit(ps.toArray)))
      }.reduce(_ + _)
    }
  }

  /** The removal face: documents with NO blocklist hit survive.
    * r16: filters on the kernel DIRECTLY — the old screen+filter+drop
    * evaluated the tokenize/intersect tree twice (pushed-down predicate
    * + doomed projection) for columns it then dropped. NULL text stays
    * dropped (NULL hit count fails both predicates). */
  def filterBlocked(docs: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame =
    docs.filter(hitCount(textCol, phrases) === 0)
}

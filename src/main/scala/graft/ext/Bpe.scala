package graft.ext

import java.util.regex.Pattern

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeCountExpr, BpeTokensExpr}
import org.apache.spark.sql.GraftBridge

/** X4 — byte-pair encoding: a REAL greedy BPE (Sennrich-style merge
  * learning + rank-greedy apply), replacing the regex pre-token COUNT
  * approximation ([[TextStats.bpeTokenCount]]) with an actual subword
  * tokenizer.
  *
  * Scale split mirrors production pipelines:
  *  - [[train]] is driver-side ON PURPOSE: vocabularies are learned
  *    offline on a bounded sample (the word-frequency table is capped at
  *    `maxWords` before it ever reaches the driver), because merge
  *    learning is inherently sequential in the merge index — merge k+1's
  *    pair statistics depend on merge k having been applied. Distributing
  *    it buys nothing below vocab sizes that don't fit a driver anyway.
  *  - [[tokenCount]] / [[tokens]] are the 100 TB path: native expressions
  *    (`functions/BpeExpressions`) whose merge table rides into codegen as
  *    a reference object — per row a tight greedy loop over pre-tokens,
  *    no UDF boxing, no shuffle, whole-stage codegen kept intact.
  *
  * Pre-tokenizer (shared by train and apply, and identical to the
  * [[TextStats.bpeTokenCount]] contract): letter runs, digit runs, single
  * non-space symbols.
  */
object Bpe {

  val PretokenRegex = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"
  private val pretokPattern = Pattern.compile(PretokenRegex)

  /** Lowercased pre-tokens of one string (driver-side mirror of the
    * expression's inner pre-tokenizer). */
  def pretokens(text: String): Seq[String] = {
    // Locale.ROOT — see the kernel's note: locale-independent lowercasing
    val m = pretokPattern.matcher(text.toLowerCase(java.util.Locale.ROOT))
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Learn `numMerges` merges from a word-frequency table. Deterministic:
    * best pair = max total count, ties broken by the lexicographically
    * smallest (left, right). Words are character sequences; merges are
    * word-internal (no end-of-word marker — token counts are unaffected
    * by it and it keeps concat(tokens) == word exactly). */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      wordFreq.toSeq.map { case (w, f) => w.map(_.toString).toVector -> f }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Distributed word-frequency → driver-side merge learning. The driver
    * collect is bounded by construction: top `maxWords` pre-tokens by
    * frequency (ties on the token), counted with one scan + one shuffle. */
  def trainFromCorpus(docs: DataFrame, textCol: String,
      numMerges: Int = 200, maxWords: Int = 5000): Seq[(String, String)] = {
    val freq = docs
      .select(explode(
        regexp_extract_all(lower(col(s"`$textCol`")), lit(PretokenRegex), lit(0)))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    train(freq, numMerges)
  }

  /** Greedy rank-based encode of one word: repeatedly merge the
    * lowest-rank adjacent pair until none remains. Driver-side mirror of
    * the expression kernel (property-tested equal). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
          syms.drop(bestAt + 2)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** BPE token count of a text column under `merges` (LongType). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeCountExpr(GraftBridge.expression(text), merges))

  /** BPE tokens of a text column under `merges` (array<string>), for
    * inspection and tests; the count path avoids materializing them. */
  def tokens(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokensExpr(GraftBridge.expression(text), merges))
}

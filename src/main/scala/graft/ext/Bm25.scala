package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X4 extension — BM25 relevance scoring (the retrieval-quality workhorse
  * for training-data curation: score a corpus against a term set, keep the
  * top of the ranking).
  *
  * Okapi BM25: score(d, Q) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1) /
  * (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl)), with the standard
  * idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1).
  *
  * Plan shape, 100 TB reading: two passes over the corpus (term frequency
  * for the QUERY terms only — the per-doc relation collapses to
  * |Q| rows/doc max before any shuffle — and document length, a plain
  * count per doc). Global N/avgdl and the per-term document frequencies
  * are tiny aggregates broadcast back; nothing shuffles at corpus row
  * count except the two partial-aggregated groupBys. Tokenization is
  * whitespace + lowercase — chosen because it is expressible identically
  * in the DuckDB oracle (the point is cross-engine verifiable semantics;
  * swap the tokenizer Column for domain use).
  */
object Bm25 {

  /** Lowercased whitespace tokens of `text` (empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Score every document against `queryTerms`; returns (idCol, score)
    * for documents matching at least one term. */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "at least one query term")
    val id = col(s"`$idCol`")
    val toks = docs.select(id.as("__id"),
      explode(tokens(col(s"`$textCol`"))).as("__term"))

    // doc lengths + global scalars (tiny)
    val dl = toks.groupBy(col("__id")).agg(count(lit(1)).as("__dl"))
    val globals = dl.agg(
      count(lit(1)).as("__N"), avg(col("__dl")).as("__avgdl"))

    // query-term stats: term filter FIRST, so everything downstream is
    // bounded by |Q| rows per doc
    val qtoks = toks.filter(col("__term").isin(queryTerms: _*))
    val tf = qtoks.groupBy(col("__id"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__term"))
      .agg(count(lit(1)).as("__df"))

    val idf = log(
      (col("__N") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
    tf
      .join(dl, Seq("__id"))
      .crossJoin(broadcast(globals))
      .join(broadcast(dfreq.crossJoin(broadcast(globals))
        .select(col("__term"), idf.as("__idf"))), Seq("__term"))
      .withColumn("__contrib",
        col("__idf") * (col("__tf") * lit(k1 + 1)) /
          (col("__tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("__id"))
      .agg(sum(col("__contrib")).as("score"))
      .select(col("__id").as(idCol), col("score"))
  }
}

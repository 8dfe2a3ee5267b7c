package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X37 — exact SUBSTRING deduplication (SURVEY §2.8): remove every
  * ≥k-token span that occurs more than once across the corpus, keeping the
  * surrounding unique prose. The within-text companion of X36's line dedup
  * and X1/X2's whole-document dedup — repeated passages (chain letters,
  * license headers, syndicated paragraphs) are cut out of otherwise-unique
  * documents instead of the document being kept or dropped wholesale.
  *
  * Semantics (token-level): a token is removed iff some corpus-duplicated
  * k-gram STARTS within the k-1 positions ending at it — i.e. the token
  * lies inside an occurrence of a k-token substring that appears ≥2 times
  * corpus-wide (within-document repeats count). Overlapping duplicated
  * spans merge for free; a document reduced to nothing disappears — as
  * does a document with no tokens at all (nothing to keep; same
  * convention as [[LineDedup]]'s all-boilerplate case).
  *
  * Plan shape (the 100 TB contract — no suffix arrays, no self-joins):
  *   1. one `posexplode` to (doc, pos, token);
  *   2. k-grams by `lead` over (doc, pos) windows — row-local after one
  *      per-doc sort, no shuffle beyond the doc partitioning;
  *   3. duplicated-gram set by counting `xxhash64(gram)` — 8 bytes per
  *      gram on the count shuffle, map-side combine first; the dup set is
  *      the tail above count≥2, BROADCAST back (repeated passages are
  *      rare relative to corpus grams);
  *   4. coverage = `max(isDupStart) OVER (doc ROWS k-1 PRECEDING)` —
  *      reuses the step-2 partitioning, nothing new shuffles;
  *   5. reassembly: one groupBy(doc) of surviving tokens in order.
  *
  * Hashed counting has the same collision caveat as [[LineDedup]]
  * (documented there); the oracle query (x37_span_dedup) pins the hashed
  * plan against DuckDB's exact gram-string counting.
  */
object SpanDedup {

  /** Documents with corpus-duplicated ≥k-token substrings removed.
    *
    * @param docs     corpus; text tokenized on whitespace
    * @param idCol    document key column
    * @param textCol  text column
    * @param k        duplicated-substring granularity in tokens (a span
    *                 must contain a full k-gram to be detectable; spans
    *                 shorter than k tokens are below the resolution and
    *                 kept — that is the standard contract)
    * @param minCount occurrences (corpus-wide, within-doc repeats
    *                 included) above which a k-gram is "duplicated";
    *                 default 1 ⇒ any second occurrence triggers removal
    */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 1L): DataFrame = {
    require(k >= 2, "k-gram order must be >= 2")
    require(minCount >= 1, "minCount must be >= 1")

    val byPos = Window.partitionBy(idCol).orderBy("__pos")
    val toks = docs.select(
      col(idCol),
      posexplode(TextStats.tokens(col(textCol))).as(Seq("__pos", "__tok")))

    // k-gram starting at each position; null once lead runs off the end
    val gram = concat_ws(" ",
      (col("__tok") +: (1 until k).map(i => lead(col("__tok"), i).over(byPos))): _*)
    val withGram = toks.withColumn("__gram",
      when((1 until k).map(i => lead(col("__tok"), i).over(byPos).isNotNull)
        .reduce(_ && _), gram))

    val dup = withGram.filter(col("__gram").isNotNull)
      .groupBy(xxhash64(col("__gram")).as("__gh"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > minCount)
      .select("__gh")

    val marked = withGram
      .join(broadcast(dup), xxhash64(col("__gram")) === col("__gh"), "left_outer")
      .withColumn("__dupStart",
        when(col("__gram").isNotNull && col("__gh").isNotNull, 1).otherwise(0))

    val covered = marked.withColumn("__cov",
      max(col("__dupStart")).over(byPos.rowsBetween(-(k - 1), 0)))

    covered.filter(col("__cov") === 0)
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos").as("p"), col("__tok").as("t")))),
          x => x.getField("t")),
        " ").as(textCol))
  }
}

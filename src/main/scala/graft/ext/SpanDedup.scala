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
  *   1. (token, k-gram) pairs built ROW-LOCALLY by array slicing inside
  *      one `posexplode` — gram construction costs no shuffle and no
  *      per-document sort (an earlier draft used `lead` windows, which
  *      re-sorted the whole corpus by document twice; PlanCheck now pins
  *      the ≤2-exchange shape);
  *   2. duplicated-gram set by counting `xxhash64(gram)` — 8 bytes per
  *      gram on the count shuffle, map-side combine first; the dup set is
  *      the tail above count≥2, BROADCAST back (repeated passages are
  *      rare relative to corpus grams);
  *   3. coverage = `max(isDupStart) OVER (doc ROWS k-1 PRECEDING)` — the
  *      plan's ONLY doc-partitioned exchange;
  *   4. reassembly: one groupBy(doc) of surviving tokens, reusing the
  *      window's partitioning.
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

    // (token, hash-of-k-gram-starting-here) built row-local from the
    // token array: the gram hash is null once the window would run off
    // the end (and for every position of a below-resolution document).
    // r16: the gram is HASHED INSIDE THE LAMBDA — the k-token string
    // never leaves the row, so the posexplode materializes an 8-byte
    // long per position instead of a ~k-word string, and neither the
    // count aggregation nor the probe join re-derives the hash
    // (R16Probe: 1.92 → 1.48 s on the sf0.1 corpus; same counting
    // semantics — identical strings hash identically, collision caveat
    // unchanged and still oracle-pinned by x37_span_dedup).
    import graft.functions.ColumnOps.letCol
    val entries = letCol(TextStats.tokens(col(textCol))) { toks =>
      when(size(toks) === 0,
        array().cast("array<struct<t:string,g:bigint>>"))
        .otherwise(transform(
          sequence(lit(0), size(toks) - 1),
          i => struct(
            element_at(toks, i + 1).as("t"),
            when(i <= size(toks) - k,
              xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k))))).as("g"))))
    }
    val withGram = docs.select(
        col(idCol), posexplode(entries).as(Seq("__pos", "__e")))
      .select(col(idCol), col("__pos"),
        col("__e").getField("t").as("__tok"),
        col("__e").getField("g").as("__gh0"))

    val dup = withGram.filter(col("__gh0").isNotNull)
      .groupBy(col("__gh0").as("__gh"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > minCount)
      .select("__gh")

    val marked = withGram
      .join(broadcast(dup), col("__gh0") === col("__gh"), "left_outer")
      .withColumn("__dupStart",
        when(col("__gh0").isNotNull && col("__gh").isNotNull, 1).otherwise(0))

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

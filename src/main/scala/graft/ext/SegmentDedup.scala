package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X89 — shared-SEGMENT detection across sequences: find every maximal
  * run of ≥ `minRun` consecutive identical elements shared between two
  * different items, reported WITH positions — `(id_a, id_b, a_start,
  * b_start, run_len)`. The alignment-reporting companion of [[SpanDedup]]
  * (which removes duplicated spans without saying who shares them):
  * this is the operator behind intro/outro detection in a video corpus
  * (two different episodes of the same show share a byte-identical
  * title sequence; neither X1 nor X87 sees it, because the VIDEOS are
  * different — only a segment is shared), shared-boilerplate audits
  * between documents, and partial-overlap lineage ("clip B is seconds
  * 10–40 of clip A").
  *
  * Generic over any keyed sequence: callers supply `(id, keys:
  * array<long>)` where `keys(i)` identifies element i (frame byte
  * checksum, line hash, token hash…). [[VideoDedup.frameKeys]] is the
  * video binding.
  *
  * Plan shape (the 100 TB contract — no suffix structures, no
  * all-pairs):
  *   1. shingle hashes built ROW-LOCALLY from the key array (the
  *      [[SpanDedup]] trick): one 64-bit hash per window of `minRun`
  *      consecutive keys — no shuffle, no per-item sort;
  *   2. posexplode → `(id, pos, shash)`, optionally frequency-capped
  *      per shingle value (`maxShingleFreq` — static black frames /
  *      blank lines are the skew hazard, same as every banding kernel);
  *   3. one self-equi-join on `shash` with `id_a < id_b` — matching
  *      windows only, never item×item;
  *   4. maximal-run merge as gaps-and-islands: within `(id_a, id_b,
  *      offset = pos_a − pos_b)`, consecutive window starts collapse
  *      via `pos_a − row_number()`, one window partition + one groupBy.
  *
  * A shared run of length r ≥ minRun produces exactly the aligned
  * window matches starting at its first r − minRun + 1 positions, so
  * the island recovers the full extent: run_len = windows + minRun − 1.
  * Collision caveat: identity is 64-bit-hash equality over the window
  * (the [[LineDedup]] caveat, shared); the oracle face pins the hashed
  * plan against DuckDB's exact construction. Repeated identical
  * elements WITHIN one item yield one island per distinct alignment
  * offset — all maximal alignments are reported, which is the honest
  * contract for self-similar content.
  */
object SegmentDedup {

  /** All maximal shared runs of ≥ `minRun` consecutive equal keys
    * between distinct items: `(id_a, id_b, a_start, b_start, run_len)`,
    * positions 0-based, `id_a < id_b`.
    *
    * @param df       one row per item: `(idCol, keysCol: array<long>)`
    * @param minRun   detection resolution — shared runs shorter than
    *                 this are below resolution and not reported (the
    *                 [[SpanDedup]] k-gram contract)
    * @param maxShingleFreq drop shingle values occurring in more than F
    *                 windows corpus-wide before the join (boilerplate
    *                 cap; None = exact) */
  def sharedRuns(df: DataFrame, idCol: String, keysCol: String,
      minRun: Int, maxShingleFreq: Option[Int] = None): DataFrame = {
    require(minRun >= 2, "minRun must be >= 2")
    // row-local shingle hashes: hash the space-joined decimal rendering
    // of each minRun-window (stable, codegen'd; no UDF)
    val asStr = transform(col(keysCol), k => k.cast("string"))
    val shingles = when(size(col(keysCol)) >= minRun,
      transform(sequence(lit(0), size(col(keysCol)) - minRun),
        i => xxhash64(concat_ws(" ", slice(asStr, i + 1, lit(minRun))))))
      .otherwise(array().cast("array<bigint>"))
    val windows = df.select(col(idCol).as("id"),
      posexplode(shingles).as(Seq("pos", "shash")))
    val capped = maxShingleFreq match {
      case Some(f) => windows.join(
        windows.groupBy("shash").agg(count(lit(1)).as("__sf"))
          .filter(col("__sf") <= f).select("shash"),
        Seq("shash"))
      case None => windows
    }
    val a = capped.as("a")
    val b = capped.as("b")
    val matches = a.join(b,
        col("a.shash") === col("b.shash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
      .distinct()
    // gaps-and-islands per (pair, alignment offset): consecutive window
    // starts share pa - row_number()
    val w = Window.partitionBy(col("id_a"), col("id_b"), col("pa") - col("pb"))
      .orderBy(col("pa"))
    matches
      .withColumn("__island", col("pa") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("pa") - col("pb"), col("__island"))
      .agg(min(col("pa")).as("a_start"), min(col("pb")).as("b_start"),
        (count(lit(1)) + minRun - 1).as("run_len"))
      .select(col("id_a"), col("id_b"), col("a_start"), col("b_start"),
        col("run_len"))
  }
}

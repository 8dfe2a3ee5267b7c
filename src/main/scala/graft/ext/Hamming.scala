package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pigeonhole Hamming-distance pairing over ANY 64-bit fingerprint column
  * — the shared candidate-generation kernel behind SimHash text near-dup
  * ([[SimHash]]) and perceptual image near-dup ([[ImageDedup]]).
  *
  * Split the 64-bit fingerprint into `maxHamming + 1` chunks: two
  * fingerprints within `maxHamming` bit flips MUST agree exactly on at
  * least one chunk (pigeonhole), so a per-chunk equi-join finds every
  * qualifying pair with no crossJoin — the shape that survives 100 TB.
  * The verify step (`bit_count(xor)`) runs on the candidate set only, so
  * the output is EXACT: recall 1 by the pigeonhole argument, precision 1
  * by the verify filter. Entirely builtin codegen'd expressions.
  *
  * Chunk-key skew (a near-constant fingerprint region across the corpus —
  * e.g. letterboxed images sharing black borders) is the one scale hazard:
  * `maxChunkFreq` drops chunk buckets holding more than F fingerprints
  * before the self-join, bounding candidate volume at F per bucket like
  * [[NgramJaccard]]'s `maxShingleFreq`. A dropped bucket can only lose
  * pairs whose EVERY agreeing chunk is boilerplate — log the cap when
  * tuning recall; `None` (default) keeps exactness.
  */
object Hamming {

  /** All pairs (id_a < id_b) with Hamming(hash_a, hash_b) <= maxHamming.
    *
    * When 64 doesn't divide evenly into maxHamming+1 chunks, the top
    * `64 mod chunks` bits belong to no chunk — the pigeonhole argument
    * is unaffected (a differing bit outside every chunk kills zero
    * chunks, so ≤ maxHamming differing bits still leave ≥ 1 of the
    * maxHamming+1 chunks agreeing), and the final `bit_count` verify
    * runs on the full 64 bits regardless.
    *
    * @param df one row per item; `idCol` orderable, `hashCol` LONG.
    *   NULL fingerprints (undecodable items) are skipped.
    * @return (id_a, id_b, hamming) — exact when maxChunkFreq is None. */
  def pairs64(df: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxChunkFreq: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63, "maxHamming in [0, 63]")
    val capped = banded(df, idCol, hashCol, maxHamming, maxChunkFreq)
    val a = capped.as("a")
    val b = capped.as("b")
    val cand = a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.h").as("h_a"), col("b.h").as("h_b"))
    // the distinct collapses candidates found via SEVERAL agreeing chunks;
    // at maxHamming = 0 there is exactly one chunk, so every pair appears
    // once and the distinct is a pure extra exchange (guide §2.4: a
    // distinct on data that is already unique) — r17, measured as one AQE
    // job per call on the radius-0 media faces
    val uniq = if (maxHamming == 0) cand else cand.distinct()
    uniq
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** All CROSS pairs (id_l from `left`, id_r from `right`) with
    * Hamming(hash_l, hash_r) <= maxHamming — the two-relation face of
    * [[pairs64]] for probe-vs-index shapes (a new ingest batch against
    * an accumulated fingerprint index, corpus A against corpus B). Same
    * pigeonhole exactness; no id ordering constraint, and an id present
    * in both relations WILL pair with itself at distance 0 (callers
    * filter if identity pairs are unwanted). `maxChunkFreq` caps bucket
    * frequency per side independently. */
  def pairsBetween64(left: DataFrame, right: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int,
      maxChunkFreq: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63, "maxHamming in [0, 63]")
    val l = banded(left, idCol, hashCol, maxHamming, maxChunkFreq).as("l")
    val r = banded(right, idCol, hashCol, maxHamming, maxChunkFreq).as("r")
    l.join(r, col("l.chunk") === col("r.chunk") && col("l.key") === col("r.key"))
      .select(col("l.id").as("id_l"), col("r.id").as("id_r"),
        col("l.h").as("h_l"), col("r.h").as("h_r"))
      .distinct()
      .withColumn("hamming", bit_count(col("h_l").bitwiseXOR(col("h_r"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_l"), col("id_r"), col("hamming"))
  }

  /** Shared banding stage: (id, h, chunk, key) rows, optionally
    * frequency-capped per (chunk, key) bucket. */
  private def banded(df: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxChunkFreq: Option[Int]): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPerChunk = 64 / chunks
    val fp = df.select(col(idCol).as("id"), col(hashCol).as("h"))
      .filter(col("h").isNotNull)
    val out = fp.select(col("id"), col("h"),
      posexplode(transform(
        sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftrightunsigned", col("h"), (c * bitsPerChunk).cast("int"))
          .bitwiseAND(if (bitsPerChunk >= 64) lit(-1L)
            else shiftleft(lit(1L), bitsPerChunk) - 1L)))
        .as(Seq("chunk", "key")))
    maxChunkFreq match {
      case Some(f) => out.join(
        out.groupBy(col("chunk"), col("key"))
          .agg(count(lit(1)).as("__cf")).filter(col("__cf") <= f)
          .select(col("chunk"), col("key")),
        Seq("chunk", "key"))
      case None => out
    }
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) self-join: all pairs within Levenshtein
  * distance 1 — the approximate-matching dedup class (typo'd titles,
  * OCR'd identifiers) that exact dedup (X1) and token-set similarity
  * (X2) both miss.
  *
  * Blocking is the DELETION NEIGHBORHOOD (the FastSS/SymSpell family):
  * `ed(a,b) ≤ 1` ⟺ the sets `{a} ∪ del1(a)` and `{b} ∪ del1(b)`
  * intersect (substitution at p ⇒ both delete-at-p variants equal;
  * insertion/deletion ⇒ one string IS a variant of the other; equality
  * trivially). So: explode each string into its |s|+1 variant HASHES,
  * equi-join on the hash, verify survivors with `levenshtein`. Complete
  * by the equivalence above; exact because verification is exact (a hash
  * collision only ever adds a candidate, never drops one).
  *
  * Why not prefix/suffix segment blocking: real corpora share long
  * constant prefixes (every customer name starts "Customer#"), which
  * collapses segment blocking into one giant O(n²) block. Deletion
  * variants hash the WHOLE string minus one char — selectivity tracks
  * the strings themselves, not their format. Cost is |s|+1 exploded
  * (hash, id) pairs per row — 8 bytes of key each, built with array
  * HOFs, no UDF; candidates shuffle by hash, never text.
  */
object FuzzyJoin {

  private def variantHashes(s: Column): Column = {
    val dels = transform(
      sequence(lit(1), length(s)),
      i => xxhash64(concat(s.substr(lit(1), i - 1), s.substr(i + 1, lit(1 << 30)))))
    // sequence(1, 0) REVERSES — guard the empty string
    when(length(s) === 0, array(xxhash64(s)))
      .otherwise(array_union(array(xxhash64(s)), dels))
  }

  /** All (id_a < id_b) pairs with `levenshtein ≤ 1`, plus the distance.
    * NULL strings never match (SQL three-valued comparison semantics). */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(s"`$idCol`").as("__id"), col(s"`$strCol`").as("__s"))
      .filter(col("__s").isNotNull)
    val exploded = base
      .select(col("__id"), col("__s"), explode(variantHashes(col("__s"))).as("__h"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.__h") === col("b.__h") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__s").as("__sa"), col("b.__s").as("__sb"))
      .distinct()
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}

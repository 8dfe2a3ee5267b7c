package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ/Great-Expectations
  * operator class): declare what must hold, get one report row per
  * constraint with its exact violation count. The reference's only
  * quality net is the per-file discrepancy ledger (`monitor.py:87-137`);
  * any pipeline promoting data between zones needs column-level
  * constraints too, and at 100 TB the implementation question is pass
  * COUNT, not expressiveness.
  *
  * Plan shape by constraint class:
  *  - ALL row-local constraints (not-null, range, arbitrary predicate)
  *    fold into ONE conditional-aggregation scan — adding a constraint
  *    adds a `sum(when(violated, 1))` column, not a pass;
  *  - each uniqueness constraint is one `count − count(distinct keys)`
  *    aggregation (expressed as a grouped pre-count so the distinct
  *    expands map-side; exact, one shuffle);
  *  - each referential constraint is one anti-join count against the
  *    referenced keys (broadcast when the dimension is small — the
  *    planner's call via AQE).
  */
object Checks {

  sealed trait Check { def name: String }
  /** Column must never be NULL. */
  final case class NotNull(col: String) extends Check {
    def name = s"${col}_not_null"
  }
  /** Column must lie in [lo, hi] (NULLs are NotNull's business). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"${col}_range"
  }
  /** Arbitrary row predicate that must hold (NULL counts as violation). */
  final case class Satisfies(name: String, predicate: Column) extends Check
  /** Key columns must be unique; violations = rows beyond the first per key. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"${cols.mkString("_")}_unique"
  }
  /** Every (non-null) key must exist in `ref`'s `refCols`. */
  final case class RefIntegrity(cols: Seq[String], ref: DataFrame,
      refCols: Seq[String]) extends Check {
    def name = s"${cols.mkString("_")}_ref"
  }

  /** Functional dependency `determinant → dependent`: every determinant
    * group must map to at most one distinct non-null dependent value
    * (NULL dependents are "not provided" and never violate — the same
    * null reading as [[Survivorship]]). `violations` counts the EXCESS
    * distinct values (Σ max(0, distinct−1)): 0 iff the FD holds, and the
    * magnitude says how broken it is. The schema-profiling face of the
    * family — run over candidate column pairs to DISCOVER dependencies. */
  final case class FunctionalDependency(determinant: Seq[String],
      dependent: String) extends Check {
    def name = s"${determinant.mkString("_")}_determines_$dependent"
  }

  /** One report row per check: (check, violations), ordered by check
    * name for deterministic output. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "declare at least one check")
    val rowLocal: Seq[(String, Column)] = checks.collect {
      case c: NotNull => c.name -> col(s"`${c.col}`").isNull
      case c: InRange => c.name ->
        (col(s"`${c.col}`") < c.lo || col(s"`${c.col}`") > c.hi)
      case c: Satisfies => c.name -> !coalesce(c.predicate, lit(false))
    }
    val rowReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else Some {
        val agg = df.agg(
          sum(when(rowLocal.head._2, 1L).otherwise(0L)).as(rowLocal.head._1),
          rowLocal.tail.map { case (n, v) =>
            sum(when(v, 1L).otherwise(0L)).as(n) }: _*)
        agg.select(explode(array(rowLocal.map { case (n, _) =>
            struct(lit(n).as("check"),
              coalesce(col(s"`$n`"), lit(0L)).as("violations")) }: _*)).as("r"))
          .select(col("r.check"), col("r.violations"))
      }
    val others: Seq[DataFrame] = checks.collect {
      case c: Unique =>
        val keyCols = c.cols.map(k => col(s"`$k`"))
        df.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
          .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("violations"))
          .select(lit(c.name).as("check"), col("violations"))
      case c: RefIntegrity =>
        val probe = df.select(c.cols.map(k => col(s"`$k`")): _*)
          .na.drop(c.cols)
        val refKeys = c.ref.select(c.refCols.zip(c.cols).map {
          case (r, p) => col(s"`$r`").as(p) }: _*).distinct()
        probe.join(refKeys, c.cols, "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(c.name).as("check"), col("violations"))
      case c: FunctionalDependency =>
        df.groupBy(c.determinant.map(k => col(s"`$k`")): _*)
          .agg(countDistinct(col(s"`${c.dependent}`")).as("__d"))
          .agg(coalesce(sum(greatest(col("__d") - 1L, lit(0L))), lit(0L))
            .as("violations"))
          .select(lit(c.name).as("check"), col("violations"))
    }
    (rowReport.toSeq ++ others)
      .reduce(_ unionByName _)
      .orderBy(col("check"))
  }

  /** k-anonymity screen (round 8) — the data-RELEASE guard the row
    * checks above don't cover: a published dataset is k-anonymous over
    * a quasi-identifier set when every combination of those attributes
    * matches at least k rows; a group below k singles people out by
    * attribute intersection even with direct identifiers scrubbed
    * (X19's PII redaction removes the email; zip+age+lang can still
    * re-identify). Returns the VIOLATING groups (quasiCols..., n_rows),
    * n_rows < k — empty means the release passes at level k. One
    * partial-agged groupBy; the quasi-set relation is far smaller than
    * the data. NULL attribute values group together (SQL GROUP BY
    * semantics) — treat NULL as its own publishable value, which is the
    * conservative reading. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k-anonymity below 2 is vacuous")
    df.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") < k)
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema-evolving union for drift-prone ingestion: combine N frames
  * whose schemas have diverged over time (added/removed columns, widened
  * numeric types) into one frame on the WIDEST common schema — the
  * table-level answer to the reference's crawler re-inference drift
  * (`/root/reference/README.md:370`: the last-crawled partition "hogs"
  * the shared metadata table's schema; here no partition hogs anything).
  * [[graft.etl.SchemaEnforce]] is the strict face (declared schema,
  * drift to the ledger); this is the permissive face for exploratory /
  * backfill reads where refusing old partitions is wrong.
  *
  * Rules (deliberately narrower than ANSI implicit casts — ingestion
  * should not silently parse strings):
  *  - missing columns are NULL-filled;
  *  - integral widths unify upward (byte→short→int→long);
  *  - integral ∪ fractional → double; float ∪ double → double;
  *  - decimals unify to the covering (precision, scale); decimal ∪ other
  *    numeric → double;
  *  - date ∪ timestamp → timestamp;
  *  - equal types pass through; ANYTHING else (string ∪ long, …) throws —
  *    a type that changed KIND is a pipeline bug, not drift.
  *
  * Column order is first-appearance order, so the output schema is
  * stable under re-ordering of later inputs. Purely a plan rewrite
  * (projections + unionByName) — nothing materializes.
  */
object SchemaEvolution {

  /** Widest common type, or None when the kinds are incompatible. */
  private[sources] def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (x: DecimalType, y: DecimalType) =>
      val scale = math.max(x.scale, y.scale)
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      Some(DecimalType(math.min(intDigits + scale, DecimalType.MAX_PRECISION), scale))
    case (x: NumericType, y: NumericType) =>
      val order: Seq[DataType] =
        Seq(ByteType, ShortType, IntegerType, LongType)
      (x, y) match {
        case (_: DecimalType, _) | (_, _: DecimalType) => Some(DoubleType)
        case _ if order.contains(x) && order.contains(y) =>
          Some(order(math.max(order.indexOf(x), order.indexOf(y))))
        case _ => Some(DoubleType) // any fractional in the mix
      }
    case (DateType, TimestampType) | (TimestampType, DateType) => Some(TimestampType)
    case _ => None
  }

  /** Union `dfs` on the widest common schema. Throws on kind-level type
    * conflicts, naming the column and both types. */
  def unionEvolve(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "at least one frame")
    // first-appearance column order with per-column widest type
    val target = dfs.foldLeft(Vector.empty[StructField]) { (acc, df) =>
      df.schema.fields.foldLeft(acc) { (a, f) =>
        a.indexWhere(_.name == f.name) match {
          case -1 => a :+ f
          case i =>
            val merged = widen(a(i).dataType, f.dataType).getOrElse(
              throw new IllegalArgumentException(
                s"column '${f.name}': incompatible kinds " +
                  s"${a(i).dataType.simpleString} vs ${f.dataType.simpleString}"))
            a.updated(i, StructField(f.name, merged, nullable = true))
        }
      }
    }
    dfs.map { df =>
      val have = df.schema.fieldNames.toSet
      val cols: Seq[Column] = target.map { f =>
        if (have.contains(f.name)) col(s"`${f.name}`").cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      df.select(cols: _*)
    }.reduce(_.unionByName(_))
  }
}

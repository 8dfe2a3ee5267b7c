package graft.ext

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("finds substitution, insertion, deletion, and exact-dup pairs") {
    val df = Seq(
      (1L, "spark engine"),
      (2L, "spark enjine"),  // substitution
      (3L, "spark enginee"), // insertion
      (4L, "spark engin"),   // deletion
      (5L, "spark engine"),  // exact duplicate
      (6L, "flink runtime")  // unrelated
    ).toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(df, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (1L, 5L, 0L),
      (2L, 5L, 1L), (3L, 5L, 1L), (4L, 5L, 1L)))
  }

  test("matches a brute-force oracle on a generated corpus") {
    val strs = (0 until 120).map { i =>
      val base = f"item-${i / 3}%04d-label"
      i % 3 match {
        case 0 => (i.toLong, base)
        case 1 => (i.toLong, base.updated(6, 'X')) // substitution
        case 2 => (i.toLong, base.drop(1))         // deletion
      }
    }
    val df = strs.toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(df, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("no cross join in the plan; empty and null strings are safe") {
    val df = Seq((1L, ""), (2L, Option.empty[String].orNull), (3L, "a"))
      .toDF("id", "s")
    val out = FuzzyJoin.editDistanceJoin(df, "id", "s")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // "" vs "a" is distance 1 (deletion); null joins nothing
    assert(out.as[(Long, Long, Long)].collect().toSet === Set((1L, 3L, 1L)))
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ColumnOps.jaroWinklerSim

/** [[JaroWinklerSim]] / [[JaroWinklerImpl]] — semantics pinned to the
  * standard (= DuckDB `jaro_winkler_similarity`, the x44 oracle):
  * boost threshold 0.7, prefix scale 0.1, prefix cap 4, empty → 0. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[(String, String, Double)] = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),  // textbook transposition
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("abc", "", 0.0),
    ("", "", 0.0),                              // DuckDB convention
    ("ab", "cd", 0.0),                          // no matches
    ("aaxxxx", "aayyyy", 0.5555555555555555),   // jaro < 0.7: NO boost
    ("trate", "trace", 0.9066666666666667),     // prefix 3 boost
    ("ab", "a", 0.8500000000000001),
    ("aaaaaaab", "aaaaaaac", 0.95))             // prefix capped at 4

  test("kernel matches the pinned reference values bit-for-bit-ish") {
    cases.foreach { case (a, b, want) =>
      assert(math.abs(JaroWinklerImpl.similarity(a, b) - want) < 1e-12,
        s"similarity($a, $b)")
    }
  }

  test("expression agrees with the kernel through codegen and handles null") {
    val df = cases.map { case (a, b, w) => (a, b, w) }
      .toDF("a", "b", "want")
    val bad = df.select(jaroWinklerSim(col("a"), col("b")).as("got"),
        col("want"))
      .filter(abs(col("got") - col("want")) > 1e-12)
    assert(bad.count() === 0)
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(jaroWinklerSim(col("a"), col("b"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("symmetry and bounds on arbitrary pairs") {
    val words = Seq("small ring", "red widget", "blue bolt", "hot gear",
      "small gizmo", "smalll ring", "", "a")
    for (a <- words; b <- words) {
      val s = JaroWinklerImpl.similarity(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === JaroWinklerImpl.similarity(b, a), s"sym($a, $b)")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
  }
}

package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("drifted schemas union on the widest type; missing cols NULL-fill") {
    // v1: (id int, score int); v2 widened score + added label;
    // v3 dropped score, reordered
    val v1 = Seq((1, 10)).toDF("id", "score")
    val v2 = Seq((2L, 2.5, "b")).toDF("id", "score", "label")
    val v3 = Seq(("c", 3)).toDF("label", "id")

    val got = SchemaEvolution.unionEvolve(Seq(v1, v2, v3))
    // first-appearance order, widened types
    assert(got.schema.fieldNames.toSeq === Seq("id", "score", "label"))
    assert(got.schema("id").dataType === LongType)     // int ∪ long
    assert(got.schema("score").dataType === DoubleType) // int ∪ double
    val rows = got.orderBy("id")
      .as[(Long, Option[Double], Option[String])].collect().toSeq
    assert(rows === Seq(
      (1L, Some(10.0), None),
      (2L, Some(2.5), Some("b")),
      (3L, None, Some("c"))))
  }

  test("date unifies with timestamp; decimals unify to covering widths") {
    assert(SchemaEvolution.widen(DateType, TimestampType) === Some(TimestampType))
    assert(SchemaEvolution.widen(DecimalType(10, 2), DecimalType(12, 4))
      === Some(DecimalType(12, 4))) // max(8,8) int digits + max scale 4
    assert(SchemaEvolution.widen(DecimalType(10, 2), LongType) === Some(DoubleType))
  }

  test("kind-level conflicts are a pipeline bug, not drift") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, 5.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.unionEvolve(Seq(a, b))
    }
    assert(e.getMessage.contains("'v'"))
  }
}

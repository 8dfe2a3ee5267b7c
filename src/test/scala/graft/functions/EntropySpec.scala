package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CharEntropy]] — code-point Shannon entropy kernel. The cross-engine
  * arithmetic pin (DuckDB char-histogram SQL) is x63_entropy. */
class EntropySpec extends SparkSpec {
  import spark.implicits._

  private def ent(s: String): Double =
    Seq(s).toDF("t").select(EntropyFunctions.charEntropy(col("t")))
      .as[Double].head()

  test("known values: constant 0, uniform ln k, mixed hand-computed") {
    assert(ent("") === 0.0)
    assert(ent("aaaa") === 0.0)
    assert(math.abs(ent("ab") - math.log(2)) < 1e-12)
    assert(math.abs(ent("abcd") - math.log(4)) < 1e-12)
    // aabbbb: ln 6 - (2 ln 2 + 4 ln 4)/6
    val expected = math.log(6) - (2 * math.log(2) + 4 * math.log(4)) / 6
    assert(math.abs(ent("aabbbb") - expected) < 1e-12)
  }

  test("surrogate pairs count as ONE code point") {
    // U+1F600 (2 UTF-16 units) twice + 'a' twice = 2 distinct cps, 4 total
    val s = "😀a😀a"
    assert(math.abs(ent(s) - math.log(2)) < 1e-12)
  }

  test("discriminates: english ~4 nats raw, boilerplate repeats lower, base64 flat-high") {
    val english = "the quick brown fox jumps over the lazy dog and keeps running"
    val repeat = "abab" * 30
    val base64 = "QWxhZGRpbjpvcGVuIHNlc2FtZQ8sK3J9TmV4dFVwMTIzNDU2Nzg5MGFiY2RlZg"
    assert(ent(repeat) < 1.0)
    assert(ent(english) > 2.5 && ent(english) < 4.5)
    assert(ent(base64) > ent(english))
  }

  test("SQL registration and codegen agree with the kernel") {
    val viaSql = Seq("aabbbb").toDF("t").createOrReplaceTempView("ent_t")
    val got = spark.sql("SELECT char_entropy(t) FROM ent_t").as[Double].head()
    assert(got === EntropyKernel.charEntropy("aabbbb"))
    // null propagates
    assert(Seq(Option.empty[String]).toDF("t")
      .select(EntropyFunctions.charEntropy(col("t"))).head().isNullAt(0))
  }
}

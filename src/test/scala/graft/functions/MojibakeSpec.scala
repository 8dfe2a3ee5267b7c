package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[FixMojibake]] — double-encoding repair kernel + codegen path.
  * Tier B: no oracle engine can perform the repair; the ground truth is
  * the round-trip itself (corrupt(original) must repair to original)
  * across scripts and both mis-decode charsets. */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  /** The corruption being repaired: UTF-8 bytes mis-read as latin1. */
  private def latin1Mojibake(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1)

  /** Same mistake through Windows-1252 (the browser-era default). */
  private def cp1252Mojibake(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), "windows-1252")

  private val originals = Seq(
    "café au lait",
    "naïve résumé",
    "mañana señor",
    "Grüße aus Köln",
    "日本語のテキスト",      // 3-byte sequences
    "смешанный текст",       // Cyrillic
    "curly ’quote‘ and — dash") // cp1252 specials via C2/E2 leads

  test("latin1 double-encoding round-trips to the original") {
    for (o <- originals) {
      assert(MojibakeKernel.fix(latin1Mojibake(o)) === o, s"latin1: $o")
    }
  }

  test("cp1252 double-encoding round-trips (0x80-0x9F printables)") {
    // U+2019 -> E2 80 99 -> cp1252 shows 'â€™' — the € / ™ chars only
    // exist because the mis-decoder was cp1252, not latin1. Originals
    // whose UTF-8 hits one of cp1252's 5 UNDEFINED slots (0x81, 8D, 8F,
    // 90, 9D — e.g. の = E3 81 AE) were decoded LOSSILY to U+FFFD: no
    // repair can exist, and the kernel must pass them through untouched
    // rather than guess.
    for (o <- originals) {
      val m = cp1252Mojibake(o)
      if (m.contains('�'))
        assert(MojibakeKernel.fix(m) === m, s"lossy cp1252 untouched: $o")
      else
        assert(MojibakeKernel.fix(m) === o, s"cp1252: $o (mojibake: $m)")
    }
    // at least one original must exercise each arm
    assert(originals.map(cp1252Mojibake).exists(_.contains('�')))
    assert(originals.map(cp1252Mojibake).exists(!_.contains('�')))
  }

  test("clean text passes through untouched (ASCII, accents, CJK)") {
    for (o <- originals :+ "plain ascii text!" :+ "tab\tand newline\n") {
      assert(MojibakeKernel.fix(o) === o, s"clean: $o")
    }
  }

  test("double mojibake (corrupted twice) repairs through iteration") {
    val twice = latin1Mojibake(latin1Mojibake("élan vital"))
    assert(MojibakeKernel.fix(twice) === "élan vital")
  }

  test("idempotence: fix(fix(x)) = fix(x)") {
    for (o <- originals; m <- Seq(o, latin1Mojibake(o))) {
      val once = MojibakeKernel.fix(m)
      assert(MojibakeKernel.fix(once) === once)
    }
  }

  test("SQL surface: fix_mojibake and the unicode functions resolve by name") {
    Seq(latin1Mojibake("café")).toDF("t").createOrReplaceTempView("mj_t")
    assert(spark.sql("SELECT fix_mojibake(t) FROM mj_t")
      .as[String].head() === "café")
    assert(spark.sql("SELECT nfc_normalize('é')")
      .as[String].head() === "é")
    assert(spark.sql("SELECT strip_accents('crème brûlée')")
      .as[String].head() === "creme brulee")
    assert(spark.sql("SELECT jaro_winkler_sim('martha', 'martha')")
      .as[Double].head() === 1.0)
  }

  test("codegen path: the expression repairs a corrupted column at scan") {
    val df = originals.map(o => (o, latin1Mojibake(o)))
      .toDF("original", "corrupted")
    val got = df.select(col("original"),
        ColumnOps.fixMojibake(col("corrupted")).as("fixed"))
      .as[(String, String)].collect()
    got.foreach { case (o, f) => assert(f === o) }
    // and nulls stay null (nullIntolerant)
    val n = Seq[Option[String]](None).toDF("s")
      .select(ColumnOps.fixMojibake(col("s"))).collect().head
    assert(n.isNullAt(0))
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ColumnOps.{nfcNormalize, stripAccents}

/** [[NfcNormalize]] / [[StripAccents]] -- kernels + codegen path; the
  * cross-engine face is oracle-checked as x53_normalize. Accented
  * strings are BUILT from code points so composition form is explicit
  * (source-literal accents are ambiguous between NFC/NFD). */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val acute = "\u0301"  // combining acute
  private val grave = "\u0300"  // combining grave
  private val eAcuteNfc = "\u00e9"
  private val eAcuteNfd = "e" + acute
  private val aGraveNfc = "\u00e0"

  test("nfc composes decomposed sequences; idempotent; fast-path on NFC input") {
    assert(UnicodeKernels.nfc(eAcuteNfd) === eAcuteNfc)
    assert(UnicodeKernels.nfc(eAcuteNfc) === eAcuteNfc)
    assert(UnicodeKernels.nfc("") === "")
    assert(UnicodeKernels.nfc("plain ascii") === "plain ascii")
    // b + combining acute has NO precomposed form: NFC leaves it alone
    assert(UnicodeKernels.nfc("a" + grave + "b" + acute) ===
      aGraveNfc + "b" + acute)
  }

  test("stripAccents removes combining marks from either form; non-accented preserved") {
    assert(UnicodeKernels.stripAccents("caf" + eAcuteNfc) === "cafe")
    assert(UnicodeKernels.stripAccents("caf" + eAcuteNfd) === "cafe")
    assert(UnicodeKernels.stripAccents(aGraveNfc + " la carte") === "a la carte")
    assert(UnicodeKernels.stripAccents("no accents") === "no accents")
    // no-mark input passes through UNTOUCHED (not NFD'd): Hangul
    // decomposes to jamo under NFD but carries no combining marks
    val hangul = "\uD55C"
    assert(UnicodeKernels.stripAccents(hangul) === hangul)
  }

  test("expressions agree with kernels through codegen; null propagates") {
    val in = eAcuteNfd + "cole caf" + eAcuteNfd
    val df = Seq(Option(in), Option.empty[String]).toDF("s")
    val rows = df.select(nfcNormalize(col("s")).as("n"),
      stripAccents(col("s")).as("p")).collect()
    assert(rows(0).getString(0) === eAcuteNfc + "cole caf" + eAcuteNfc)
    assert(rows(0).getString(1) === "ecole cafe")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }
}

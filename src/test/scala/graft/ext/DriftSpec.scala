package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Drift]] — PSI drift monitor. Cross-engine face is x69_psi. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def vals(xs: Seq[Double], g: String = "g"): DataFrame =
    xs.map(v => (g, v)).toDF("k", "v")

  private def psiOf(b: DataFrame, a: DataFrame): Double =
    Drift.psi(b, a, Seq("k"), "v", bins = 4, lo = 0.0, hi = 4.0)
      .select("psi").as[Double].head()

  test("identical distributions score ~0; symmetric under swap") {
    val d = vals(Seq(0.5, 1.5, 1.5, 2.5, 3.5))
    assert(psiOf(d, d) === 0.0)
    val e = vals(Seq(0.5, 0.5, 1.5, 2.5))
    assert(math.abs(psiOf(d, e) - psiOf(e, d)) < 1e-9)
  }

  test("mass shift scores higher than mild reweighting; bins pinned by hand") {
    val base = vals(Seq.fill(50)(0.5) ++ Seq.fill(50)(2.5))
    val mild = vals(Seq.fill(45)(0.5) ++ Seq.fill(55)(2.5))
    val wild = vals(Seq.fill(95)(3.5) ++ Seq.fill(5)(0.5))
    assert(psiOf(base, mild) < 0.1)        // stable band
    assert(psiOf(base, wild) > 0.25)       // broken band
    assert(psiOf(base, mild) < psiOf(base, wild))
  }

  test("under/overflow bins catch out-of-range drift; groups isolated") {
    val in = vals(Seq(1.0, 2.0, 3.0))
    val out = vals(Seq(-5.0, 9.0, 7.0)) // all mass in bins 0 and overflow
    assert(psiOf(in, out) > 0.25)
    // a second untouched group keeps psi 0 while the first drifts
    val b2 = in.unionByName(vals(Seq(1.0, 2.0), g = "h")
      .select(lit("h").as("k"), col("v")))
    val a2 = out.unionByName(vals(Seq(1.0, 2.0), g = "h")
      .select(lit("h").as("k"), col("v")))
    val per = Drift.psi(b2, a2, Seq("k"), "v", bins = 4, lo = 0.0, hi = 4.0)
      .as[(String, Double)].collect().toMap
    assert(per("h") === 0.0 && per("g") > 0.25)
  }

  test("ks: hand values, full separation, identity, cross-side ties") {
    def ksOf(b: Seq[Double], a: Seq[Double]): Double =
      Drift.ks(vals(b), vals(a), Seq("k"), "v").select("ks").as[Double].head()
    assert(ksOf(Seq(1, 2), Seq(3, 4)) === 1.0)       // disjoint supports
    assert(ksOf(Seq(1, 2, 3), Seq(1, 2, 3)) === 0.0) // identical
    // F_b - F_a peaks at v=2: 0.5 - 0 = 0.5
    assert(ksOf(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6)) === 0.5)
    // ties across sides consumed together: D = 2/3 at v=2
    assert(ksOf(Seq(1, 1, 2), Seq(1, 3, 3)) === 0.6667)
  }

  test("categorical psi: stable shares ~0, vanished/new categories punished") {
    def cats(xs: Seq[String]): DataFrame = xs.map(("g", _)).toDF("k", "c")
    def cp(b: Seq[String], a: Seq[String]): Double =
      Drift.psiCategorical(cats(b), cats(a), Seq("k"), "c")
        .select("psi").as[Double].head()
    val base = Seq.fill(50)("x") ++ Seq.fill(50)("y")
    assert(cp(base, base) === 0.0)
    assert(cp(base, Seq.fill(48)("x") ++ Seq.fill(52)("y")) < 0.1)
    // a category replaced wholesale: far into the broken band
    assert(cp(base, Seq.fill(50)("x") ++ Seq.fill(50)("z")) > 0.25)
  }

  test("psiDetail terms sum to psi and localize the moved mass") {
    val b = vals(Seq.fill(80)(0.5) ++ Seq.fill(20)(2.5))
    val a = vals(Seq.fill(20)(0.5) ++ Seq.fill(80)(2.5))
    val det = Drift.psiDetail(b, a, Seq("k"), "v", bins = 4, lo = 0, hi = 4)
    val total = det.agg(sum("term")).as[Double].head()
    val reported = psiOf(b, a)
    assert(math.abs(total + 1e-9 - reported) < 1e-4)
    // the two bins that exchanged mass carry essentially all the score
    val byBin = det.select("bin", "term").as[(Int, Double)].collect().toMap
    assert(byBin(1) + byBin(3) > 0.9 * total)
  }
}

class EmbeddingDriftSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def vecs(rows: Seq[Seq[Float]]): org.apache.spark.sql.DataFrame =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  test("a planted mean shift in one dimension yields the hand-computed smd") {
    // dim 0 shifts by +2 with sd 1 on both sides; dim 1 identical
    val ref = vecs(Seq(Seq(0f, 5f), Seq(2f, 5f), Seq(0f, 7f), Seq(2f, 7f)))
    val cur = vecs(Seq(Seq(2f, 5f), Seq(4f, 5f), Seq(2f, 7f), Seq(4f, 7f)))
    val got = Drift.embeddingDrift(ref, cur)
      .orderBy($"dim").collect()
    // dim 0: means 1 -> 3, var = 4/3 both sides, pooled sd = sqrt(4/3),
    // smd = 2 / 1.1547 = 1.7321 (rounded)
    val d0 = got(0)
    assert(d0.getInt(0) === 0 && d0.getDouble(1) === 1.0 &&
      d0.getDouble(2) === 3.0 && math.abs(d0.getDouble(3) - 1.7321) < 1e-9)
    // dim 1: no shift -> smd 0
    val d1 = got(1)
    assert(d1.getDouble(1) === 6.0 && d1.getDouble(2) === 6.0 &&
      d1.getDouble(3) === 0.0)
  }

  test("zero pooled variance yields NULL smd, never Inf") {
    val ref = vecs(Seq(Seq(1f), Seq(1f)))
    val cur = vecs(Seq(Seq(3f), Seq(3f)))
    val r = Drift.embeddingDrift(ref, cur).collect().head
    assert(r.getDouble(1) === 1.0 && r.getDouble(2) === 3.0 && r.isNullAt(3))
  }

  test("identical corpora report zero drift in every dimension") {
    val both = vecs(Seq.tabulate(10)(i => Seq(i.toFloat, (i * i).toFloat)))
    val r = Drift.embeddingDrift(both, both)
    assert(r.filter($"smd" =!= 0.0).count() === 0)
    assert(r.count() === 2)
  }
}

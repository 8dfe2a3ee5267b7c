package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Pca]] — one-pass moments + driver Jacobi + row-local projection.
  * Fixtures are constructed so the true principal axes are known. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def norm(a: Seq[Double]): Double = math.sqrt(dot(a, a))

  /** 400 points in R^4: mean (1,2,3,4), dominant variance along u, less
    * along v, none elsewhere; u ⊥ v chosen axis-aligned for clarity. */
  private val u = IndexedSeq(1.0, 0.0, 0.0, 0.0)
  private val v = IndexedSeq(0.0, 1.0, 0.0, 0.0)
  private def fixture = {
    val rnd = new scala.util.Random(7)
    (1 to 400).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.0
      (i.toLong, (0 until 4).map(j =>
        (1.0 + j + a * u(j) + b * v(j)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("fit recovers known principal axes, ordered by variance") {
    val (m, total) = Pca.fit(fixture, k = 2)
    assert(m.dim === 4 && m.k === 2)
    // mean ~ (1,2,3,4)
    m.mean.zip(Seq(1.0, 2.0, 3.0, 4.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.5, s"mean $got vs $want")
    }
    // component 0 ~ ±u with variance ~9; component 1 ~ ±v with variance ~1
    assert(math.abs(dot(m.components(0), u)) > 0.99)
    assert(math.abs(dot(m.components(1), v)) > 0.99)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(m.eigenvalues(0) > 6.0 && m.eigenvalues(0) < 12.0)
    assert(m.eigenvalues(1) > 0.6 && m.eigenvalues(1) < 1.6)
    // sign convention: largest-|entry| positive
    m.components.foreach { c =>
      assert(c(c.indices.maxBy(i => math.abs(c(i)))) > 0)
    }
    // explained variance: the two real directions carry ~all of it
    assert(m.explained(total) > 0.95)
  }

  test("components are orthonormal") {
    val (m, _) = Pca.fit(fixture, k = 4)
    for (i <- 0 until 4; j <- 0 until 4) {
      val g = dot(m.components(i), m.components(j))
      if (i == j) assert(math.abs(g - 1.0) < 1e-9)
      else assert(math.abs(g) < 1e-9, s"components $i,$j not orthogonal: $g")
    }
  }

  test("full-rank project + reconstruct inverts (up to float input rounding)") {
    val (m, _) = Pca.fit(fixture, k = 4)
    val rows = Pca.project(fixture, m)
      .withColumn("rec", Pca.reconstructCol(col("pca"), m))
      .select(col("embedding"), col("rec"))
      .as[(Seq[Float], Seq[Double])].collect()
    rows.foreach { case (orig, rec) =>
      orig.zip(rec).foreach { case (o, r) =>
        assert(math.abs(o - r) < 1e-4, s"$o vs $r")
      }
    }
  }

  test("whitened projection has ~unit variance per component, zero mean") {
    val (m, _) = Pca.fit(fixture, k = 2)
    val stats = Pca.project(fixture, m, whiten = true)
      .select(posexplode(col("pca")))
      .groupBy(col("pos"))
      .agg(avg(col("col")).as("mu"), var_pop(col("col")).as("s2"))
      .orderBy(col("pos"))
      .as[(Int, Double, Double)].collect()
    assert(stats.length === 2)
    stats.foreach { case (_, mu, s2) =>
      assert(math.abs(mu) < 1e-6)
      assert(math.abs(s2 - 1.0) < 1e-6)
    }
  }

  test("zero-variance direction whitens to 0.0 instead of exploding") {
    // all mass on dim 0 — dims 1..3 have eigenvalue 0
    val flat = (1 to 50)
      .map(i => (i.toLong, Seq(i.toFloat, 2.0f, 2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val (m, _) = Pca.fit(flat, k = 4)
    val p = Pca.project(flat, m, whiten = true)
      .select(col("pca")).as[Seq[Double]].head()
    assert(p.tail.forall(x => x === 0.0 || math.abs(x) < 1e-6))
    assert(p.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("deterministic: same corpus, same model; sample fraction fits on a subset") {
    val (m1, t1) = Pca.fit(fixture, k = 2)
    val (m2, t2) = Pca.fit(fixture, k = 2)
    assert(m1 === m2 && t1 === t2)
    val (ms, _) = Pca.fit(fixture, k = 2, sampleFraction = 0.5)
    // a half-sample still recovers the dominant axis
    assert(math.abs(dot(ms.components(0), u)) > 0.98)
  }

  test("incremental: batch moments fold to the union's fit, history unscanned") {
    val full = fixture
    val batches = Seq(
      full.filter($"vec_id" <= 100),
      full.filter($"vec_id" > 100 && $"vec_id" <= 300),
      full.filter($"vec_id" > 300))
    // the fold touches each batch exactly once
    val folded = batches.map(b => Pca.moments(b))
      .reduce(_ merge _)
    val whole = Pca.moments(full)
    assert(folded.n === whole.n)
    folded.sums.zip(whole.sums).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
    folded.prods.zip(whole.prods).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6)
    }
    // refit from the folded state recovers the same structure
    val (mf, _) = Pca.fitFromMoments(folded, k = 2)
    val (mw, _) = Pca.fit(full, k = 2)
    mf.components.zip(mw.components).foreach { case (a, b) =>
      assert(math.abs(math.abs(dot(a, b)) - 1.0) < 1e-6)
    }
    mf.eigenvalues.zip(mw.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6)
    }
    // merge is commutative and respects the empty identity
    val empty = Pca.Moments(0, IndexedSeq.empty, IndexedSeq.empty)
    assert((empty merge folded) === folded)
    assert((folded merge empty) === folded)
  }

  test("moments kernel: driver-checked covariance on a tiny corpus") {
    val rows = Seq(
      Seq(1.0f, 2.0f), Seq(3.0f, 5.0f), Seq(-1.0f, 0.5f), Seq(2.0f, -2.0f))
    val df = rows.zipWithIndex.map { case (r, i) => (i.toLong, r) }
      .toDF("vec_id", "embedding")
    val (m, total) = Pca.fit(df, k = 2)
    // brute-force covariance on the driver
    val n = rows.length
    val mean = Seq(0, 1).map(j => rows.map(_(j).toDouble).sum / n)
    def cov(i: Int, j: Int): Double =
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    // eigen invariants: trace and determinant preserved
    val tr = cov(0, 0) + cov(1, 1)
    val det = cov(0, 0) * cov(1, 1) - cov(0, 1) * cov(0, 1)
    val evs = m.eigenvalues
    assert(math.abs(evs.sum - tr) < 1e-9)
    assert(math.abs(evs.product - det) < 1e-9)
    assert(math.abs(total - tr) < 1e-9)
    m.mean.zip(mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }
}

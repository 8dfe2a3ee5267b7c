package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvFunctions._
import graft.functions.KmvSketch

/** X98 KMV theta sketches: exactness below saturation, estimate accuracy
  * above it, partition invariance (mergeability), set algebra, and the
  * overlap report. */
class SetSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(xs: Seq[Long], k: Int, parts: Int = 7): Array[Byte] =
    xs.toDF("x").repartition(parts)
      .agg(kmvSketch(xxhash64($"x"), k).as("s"))
      .collect().head.getAs[Array[Byte]]("s")

  test("unsaturated sketches are exact, whatever the partitioning") {
    val xs = (1L to 900L) ++ (1L to 900L) // duplicates must not count
    for (parts <- Seq(1, 7, 32)) {
      val s = sketchOf(xs, k = 1024, parts)
      assert(KmvSketch.estimate(s) === 900.0)
    }
  }

  test("merge across partitions equals a single-partition build bit for bit") {
    val xs = (1L to 5000L)
    assert(sketchOf(xs, k = 256, parts = 32).toSeq ===
      sketchOf(xs, k = 256, parts = 1).toSeq)
  }

  test("saturated estimate lands within the KMV error bound regime") {
    val n = 20000L
    val s = sketchOf(1L to n, k = 512)
    val est = KmvSketch.estimate(s)
    // 1/sqrt(k-2) ~ 4.4%; gate at 3 sigma
    assert(math.abs(est - n) / n < 0.14, s"estimate $est vs $n")
  }

  test("intersection and difference: exact below saturation") {
    val a = sketchOf(1L to 1000L, k = 2048)
    val b = sketchOf(600L to 1600L, k = 2048)
    assert(KmvSketch.intersectEstimate(a, b) === 401.0)
    assert(KmvSketch.differenceEstimate(a, b) === 599.0)
    assert(KmvSketch.differenceEstimate(b, a) === 600.0)
  }

  test("intersection estimate under saturation tracks the true overlap") {
    val a = sketchOf(1L to 20000L, k = 512)
    val b = sketchOf(10001L to 30000L, k = 512)
    val est = KmvSketch.intersectEstimate(a, b)
    // true overlap 10000; theta-intersection variance is larger than the
    // single-set bound — gate loosely but meaningfully
    assert(est > 5000 && est < 15000, s"intersect estimate $est vs 10000")
    // decomposition: intersect + difference share one theta, so their
    // sum is itself a KMV estimate of |A| — it must land near 20000
    val total = KmvSketch.intersectEstimate(a, b) +
      KmvSketch.differenceEstimate(a, b)
    assert(math.abs(total - 20000.0) / 20000.0 < 0.2,
      s"theta-consistent decomposition drifted: $total vs 20000")
  }

  test("saturated self-intersection equals the sketch's own estimate") {
    // the r15 `<= theta` filter included the k-th minimum in the scaled
    // sample (k/theta, a ~1/k systematic overestimate); the strict-below
    // sample makes intersect consistent with estimate()'s (k−1)/theta
    val s = sketchOf(1L to 20000L, k = 512)
    assert(KmvSketch.intersectEstimate(s, s) === KmvSketch.estimate(s))
    assert(KmvSketch.differenceEstimate(s, s) === 0.0)
  }

  test("union sketch equals the sketch of the union") {
    // union stays exact only while the UNION itself fits under k
    val u = KmvSketch.union(sketchOf(1L to 600L, k = 1024),
      sketchOf(400L to 1000L, k = 1024))
    assert(KmvSketch.estimate(u) === 1000.0)
    val sat = KmvSketch.union(sketchOf(1L to 9000L, k = 256),
      sketchOf(5000L to 14000L, k = 256))
    val direct = sketchOf(1L to 14000L, k = 256)
    assert(sat.toSeq === direct.toSeq,
      "union of saturated sketches must equal the directly-built sketch")
  }

  test("nulls are ignored; empty input gives an exact-zero sketch") {
    val s = Seq[Option[Long]](Some(1L), None, Some(2L), None).toDF("x")
      .agg(kmvSketch(when($"x".isNotNull, xxhash64($"x")), 64).as("s"))
      .collect().head.getAs[Array[Byte]]("s")
    assert(KmvSketch.estimate(s) === 2.0)
    val e = Seq.empty[Long].toDF("x")
      .agg(kmvSketch(xxhash64($"x"), 64).as("s"))
      .collect().head.getAs[Array[Byte]]("s")
    assert(KmvSketch.estimate(e) === 0.0)
  }

  test("overlapReport: full-outer slices, exact counts, zero for disjoint") {
    val a = Seq((1L, "en", "t1"), (2L, "en", "t2"), (3L, "de", "d1"))
      .toDF("id", "lang", "text")
    val b = Seq((9L, "en", "t2"), (8L, "en", "t3"), (7L, "fr", "f1"))
      .toDF("id", "lang", "text")
    val got = SetSketch.overlapReport(a, b, Seq("lang"), col("text"), k = 64)
      .orderBy("lang")
      .select($"lang", $"a_distinct", $"b_distinct", $"overlap", $"a_only",
        $"b_only")
      .as[(String, Double, Double, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("de", 1.0, 0.0, 0.0, 1.0, 0.0),
      ("en", 2.0, 2.0, 1.0, 1.0, 1.0),
      ("fr", 0.0, 1.0, 0.0, 0.0, 1.0)))
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: first column owns the top bit; interleave is monotone per dim") {
    val df = Seq((0.0, 0.0), (1e9, 0.0), (0.0, 1e9), (1e9, 1e9))
      .toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), 8).as("z"))
    val Seq(z00, z10, z01, z11) = df.as[Long].collect().toSeq
    assert(z10 > z01, "dim 0 contributes the more significant bits")
    assert(z11 > z10 && z11 > z01 && z00 < z01)
  }

  /** Fraction of files whose [min,max] for `c` overlaps the given range. */
  private def overlapFraction(dir: String, c: String, lo: Double, hi: Double): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    val hit = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .as[(Double, Double)].collect().head
      r._1 <= hi && r._2 >= lo
    }
    hit.toDouble / files.size
  }

  test("z-ordered files prune range queries on BOTH dimensions") {
    // two independent uniform dims -> linear sort can only cluster one
    val n = 1 << 14
    val df = spark.range(n).select(
      (xxhash64(col("id")) % 1000000).cast("double").as("a"),
      (xxhash64(col("id"), lit(1)) % 1000000).cast("double").as("b"))
    val zDir = Files.createTempDirectory("graft_zorder").toString + "/z"
    val sDir = Files.createTempDirectory("graft_zorder").toString + "/s"
    ZOrder.writeZOrdered(df, Seq("a", "b"), zDir, numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(sDir) // lead-column layout for comparison

    // a ~1/8-wide range probe per dimension (values span ~[-1e6, 1e6])
    val probes = Seq(("a", 0.0, 250000.0), ("b", 0.0, 250000.0))
    for ((c, lo, hi) <- probes) {
      val zf = overlapFraction(zDir, c, lo, hi)
      assert(zf <= 0.6, s"z-order should prune most files on $c, got $zf")
    }
    // the lead-sorted layout prunes its lead column but NOT the other
    assert(overlapFraction(sDir, "a", 0.0, 250000.0) <= 0.4)
    assert(overlapFraction(sDir, "b", 0.0, 250000.0) >= 0.9,
      "every lead-sorted file spans the full range of the non-lead column")
  }
}

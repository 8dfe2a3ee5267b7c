package graft.tools

import org.apache.spark.sql.functions._

import graft.core

/** Perf diagnostic for X97 filtered ANN at scale: build an IVF-PQ index
  * over the FULL embeddings table of the given SF dir (attribute
  * `grp = vec_id % 100`, 1% selectivity), then time `topKFiltered` from
  * nprobe0 = 1 (the widening path) and at full depth. Measures the
  * operator itself — the x97 oracle face deliberately pins a SF-stable
  * 500-vector slice for hash comparability, so this probe is where the
  * corpus-scale behavior gets a number. Not part of the bench protocol.
  *
  * Usage: FannProbe [sfDir] [k] [queries] [grpModulus]
  *
  * Recall-sweep caveat: ScaleUp-replicated sets (sf10/sf100) clone each
  * vector 100-1000x with grp preserved, so "eligible" collapses to ~20
  * DISTINCT vectors at 1% selectivity — recall there measures the
  * degenerate geometry, not the operator. Sweep recall on the largest
  * DISTINCT corpus (sf0.1) at 10% selectivity (mod=10); use the
  * replicated sets for the TIMING rows only.
  */
object FannProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val nq = if (args.length > 2) args(2).toInt else 50
    val mod = if (args.length > 3) args(3).toInt else 100
    implicit val spark: org.apache.spark.sql.SparkSession =
      core.Sessions.local(appName = "graft-fannprobe")
    val dir = java.nio.file.Files.createTempDirectory("graft_fannprobe").toString
    try {
      val emb = core.Tables.load(spark, sfDir, "embeddings")
        .withColumn("grp", col("vec_id") % mod)
      val n = emb.count()
      var t0 = System.nanoTime()
      val idx = graft.ext.AnnIndex.create(emb, s"$dir/idx", k = 64,
        iters = 2, pqSubspaces = Some((8, 16)), attrCols = Seq("grp"))
      val tBuild = (System.nanoTime() - t0) / 1e9
      val queries = emb.filter(col("vec_id") < nq)
        .select(col("vec_id").as("query_id"), col("embedding"))
      def time(label: String)(body: => Long): Unit = {
        val s = System.nanoTime()
        val rows = body
        println(f"$label%-28s ${(System.nanoTime() - s) / 1e9}%7.2f s  rows=$rows")
      }
      println(f"corpus=$n rows, 64 lists, PQ 8x16, build=${tBuild}%.1f s")
      time("filtered widened (np0=1)") {
        graft.ext.AnnIndex.topKFiltered(idx, queries, col("grp") === 7,
          k = k, nprobe0 = 1).count()
      }
      time("filtered full depth") {
        graft.ext.AnnIndex.topKFiltered(idx, queries, col("grp") === 7,
          k = k, nprobe0 = 64).count()
      }
      time("unfiltered topK (np=8)") {
        graft.ext.AnnIndex.topK(idx, queries, k = k, nprobe = 8).count()
      }
      // recall sweep (r15): refined filtered recall@k vs the exact
      // filtered brute force, over the (shortlist, nprobe0) grid — the
      // corpus-scale evidence behind the AnnIndexSpec filtered-recall
      // gate (the unfiltered path has such a floor; this pins the
      // filtered one).
      val pred = col("grp") === 7
      val exact = graft.ext.Pq.exactTopK(emb.filter(pred), queries, k = k)
        .select(col("query_id"), col("id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select(col("query_id"), col("id")).collect()
          .groupBy(_.getLong(0)).map { case (q, rs) =>
            q -> rs.map(_.getLong(1)).toSet }
        exact.map { case (q, e) =>
          (got.getOrElse(q, Set.empty[Long]) & e).size.toDouble / e.size }
          .sum / exact.size
      }
      for (shortlist <- Seq(50, 100, 200); np0 <- Seq(1, 4, 8)) {
        val s = System.nanoTime()
        val r = recallOf(graft.ext.AnnIndex.topKRefinedFiltered(idx, queries,
          emb, pred, k = k, shortlist = shortlist, nprobe0 = np0))
        println(f"[fann-sweep] shortlist=$shortlist%3d nprobe0=$np0 " +
          f"recall@$k=$r%.3f  t=${(System.nanoTime() - s) / 1e9}%.1f s")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      spark.stop()
    }
  }
}

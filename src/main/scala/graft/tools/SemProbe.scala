package graft.tools

import org.apache.spark.sql.functions._

import graft.core

/** Perf diagnostic for the x0_semdedup_pca flagship: wall time per phase
  * (PCA fit, projection materialization, IVF train, assignment, SemDedup)
  * so a regression points at a stage, not the whole composition.
  * Usage: SemProbe [sfDir] [targetClusterSize] */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val target = if (args.length > 1) args(1).toInt else 512
    val spark = core.Sessions.local(appName = "graft-semprobe")
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sem] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val emb = core.Tables.load(spark, sfDir, "embeddings")
    val n = phase("count")(emb.count())
    val model = phase("pca_fit")(graft.ext.Pca.fit(emb, k = 8)._1)
    val reduced = graft.ext.Pca.project(emb, model)
      .select(col("vec_id"), col("pca").cast("array<float>").as("embedding"))
    phase("pca_project")(reduced.write.format("noop").mode("overwrite").save())
    val k = math.max(8, math.min(4096, (n / target).toInt))
    println(s"[sem] n=$n k=$k")
    val ivf = phase("ivf_train")(graft.ext.Ivf.train(reduced, k = k, iters = 2))
    phase("ivf_assign")(
      graft.ext.Ivf.assign(reduced, ivf, "embedding")
        .write.format("noop").mode("overwrite").save())
    val kept = phase("semdedup")(
      graft.ext.SemDedup.dedup(reduced, reduced.limit(0), threshold = 0.9,
          assign = Some(graft.ext.SemDedup.assignIvf(ivf)))
        .count())
    println(s"[sem] kept=$kept of $n")
    spark.stop()
  }
}

package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF/PCA model persistence: a model saved to parquet and loaded back
  * must be EQUAL (floats/doubles round-trip parquet exactly), and every
  * downstream face (assignment, top-k, projection, refit-from-moments)
  * must produce identical results from the persisted model — the
  * train-Monday/score-Tuesday contract. */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._
  implicit private val s: SparkSession = spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ms_$tag").toString

  private def corpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i =>
      (i.toLong, IndexedSeq.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("Ivf.save/load round-trips the model exactly") {
    val c = corpus(200, 16, seed = 1)
    val m = Ivf.train(c, k = 5, iters = 2)
    val path = tmp("ivf")
    Ivf.save(m, path)
    assert(Ivf.load(path) === m)
  }

  test("persisted IVF model scores identically to the in-memory one") {
    val c = corpus(300, 16, seed = 2).cache()
    val q = c.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding")
    val m = Ivf.train(c, k = 6, iters = 2)
    val path = tmp("ivf2")
    Ivf.save(m, path)
    val loaded = Ivf.load(path)
    def run(model: Ivf.Model) = Ivf.topK(c, q, model, k = 3)
      .select($"query_id", $"id", round($"score", 9).as("s"), $"rank")
      .collect().map(_.toSeq).toSet
    assert(run(loaded) === run(m))
    // assignment identical too
    val a = Ivf.assign(c, m).select($"vec_id", $"list_id").collect().toSeq
    val b = Ivf.assign(c, loaded).select($"vec_id", $"list_id").collect().toSeq
    assert(a === b)
    c.unpersist()
  }

  test("Pca.saveModel/loadModel round-trips exactly; projections identical") {
    val c = corpus(250, 12, seed = 3)
    val (m, _) = Pca.fit(c, k = 4)
    val path = tmp("pca")
    Pca.saveModel(m, path)
    val loaded = Pca.loadModel(path)
    assert(loaded === m)
    val p1 = Pca.project(c, m).select($"vec_id", $"pca").collect().map(_.toSeq)
    val p2 = Pca.project(c, loaded).select($"vec_id", $"pca").collect().map(_.toSeq)
    assert(p1.toSeq === p2.toSeq)
  }

  test("Pca.saveMoments/loadMoments: persisted state folds a new batch to the same fit") {
    val b1 = corpus(150, 10, seed = 4)
    val b2 = corpus(170, 10, seed = 5)
    // one-shot reference over the union
    val all = b1.unionByName(b2)
    val refMom = Pca.moments(all)
    // incremental with a persistence hop between the batches
    val path = tmp("mom")
    Pca.saveMoments(Pca.moments(b1), path)
    val resumed = Pca.loadMoments(path).merge(Pca.moments(b2))
    assert(resumed.n === refMom.n)
    // exact sums up to fp addition order: both sides sum per-batch exact
    // aggregates, so compare at 1e-9 relative
    resumed.sums.zip(refMom.sums).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))) }
    resumed.prods.zip(refMom.prods).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))) }
    val (m1, tv1) = Pca.fitFromMoments(resumed, k = 3)
    val (m2, tv2) = Pca.fitFromMoments(refMom, k = 3)
    assert(math.abs(tv1 - tv2) <= 1e-9 * math.abs(tv2))
    m1.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(1e-12, math.abs(b))) }
  }

  test("load rejects an empty/missing centroid store") {
    val path = tmp("bad")
    corpus(5, 4, seed = 9).limit(0)
      .select($"vec_id".cast("int").as("centroid_id"), $"embedding".as("centroid"))
      .write.mode("overwrite").parquet(path)
    intercept[IllegalArgumentException] { Ivf.load(path) }
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineSim, topCentroids}

/** X3 — IVF (inverted-file) approximate nearest neighbor: the
  * centroid-partitioned alternative to [[Similarity.lshTopK]].
  *
  * Index: k coarse centroids (k-means, a few Lloyd iterations as Spark
  * jobs); every corpus vector is assigned to its nearest centroid's
  * inverted list in ONE codegen'd scan ([[graft.functions.TopCentroids]]).
  * Query: score a vector only against the `nprobe` lists whose centroids
  * are nearest to it — an equi-join on list id, exactly the LSH bucket-join
  * shape, so cost drops from |C|·|Q| to ≈ |C|·|Q|·nprobe/k.
  *
  * Scale story (100 TB):
  *  - training runs on a SAMPLE (`sampleFraction`); the model is k×dim
  *    floats — driver/plan-literal sized, shipped in the closure, never a
  *    shuffle;
  *  - assignment is a map-only pass; persisting the corpus partitioned by
  *    `list_id` (e.g. `partitionBy("list_id")` parquet) turns every later
  *    query batch into a partition-pruned scan of nprobe/k of the data;
  *  - the probe join shuffles queries (tiny) to the corpus's list
  *    partitioning, never the reverse.
  */
object Ivf {

  final case class Model(centroids: Seq[Seq[Float]]) {
    def k: Int = centroids.size
    /** Plan-literal centroid matrix column. */
    def lit: Column = typedlit(centroids)
  }

  /** Persist the trained coarse quantizer: one parquet row per centroid,
    * `(centroid_id, centroid)`. The model a Monday training run writes and
    * every later scoring run [[load]]s — k×dim floats, so the file is
    * KB-sized and the load is a driver-side collect, exactly matching how
    * the model ships into plans (a literal, never a join side). Parquet
    * round-trips float arrays exactly ⇒ loaded scores ≡ in-memory scores
    * (ModelStoreSpec pins both). */
  def save(model: Model, path: String)
      (implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("centroid_id", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def load(path: String)
      (implicit spark: org.apache.spark.sql.SparkSession): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("centroid_id").cast("int"), col("centroid"))
      .as[(Int, Seq[Float])].collect()
    require(rows.nonEmpty, s"no centroids at $path")
    Model(rows.sortBy(_._1).map(_._2.toIndexedSeq).toIndexedSeq)
  }

  /** Nearest-centroid list id of a vector under `model`. */
  def listId(vec: Column, model: Model): Column =
    element_at(topCentroids(vec, model.lit, org.apache.spark.sql.functions.lit(1)), 1)

  /** Train k centroids with `iters` Lloyd iterations (deterministic:
    * seeded hash-ordered init, fixed iteration count). Each iteration is
    * one assignment scan + one (list, dim)-keyed mean — the standard
    * distributed k-means step expressed as DataFrame aggregation.
    * @param sampleFraction train on a corpus sample (1.0 = all rows) */
  def train(corpus: DataFrame, k: Int, iters: Int = 3, seed: Long = 42,
      vecCol: String = "embedding", sampleFraction: Double = 1.0): Model = {
    val base = corpus.select(col(vecCol).as("v"))
    val sample =
      if (sampleFraction >= 1.0) base
      else base.where(pmod(xxhash64(col("v"), lit(seed)), lit(1000000)) <
        lit((sampleFraction * 1000000).toLong))
    // deterministic init: k hash-ordered distinct vectors
    var cents: Seq[Seq[Float]] = sample
      .dropDuplicates("v")
      .orderBy(xxhash64(col("v"), lit(seed)))
      .limit(k)
      .collect().map(_.getSeq[Float](0).toIndexedSeq).toIndexedSeq
    require(cents.nonEmpty, "IVF training needs a non-empty corpus")

    for (_ <- 1 to iters) {
      val model = Model(cents)
      val next = sample
        .select(listId(col("v"), model).as("list_id"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("list_id"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (lid, rows) =>
          lid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toIndexedSeq
        }
      // empty lists keep their previous centroid (standard k-means fix-up)
      cents = cents.indices.map(j => next.getOrElse(j, cents(j)))
    }
    Model(cents)
  }

  /** Corpus with its inverted-list assignment. Persist this partitioned by
    * `list_id` to make later query batches partition-pruned. */
  def assign(corpus: DataFrame, model: Model,
      vecCol: String = "embedding"): DataFrame =
    corpus.withColumn("list_id", listId(col(vecCol), model))

  /** Approximate top-k neighbors per query via nprobe inverted lists. */
  def topK(corpus: DataFrame, queries: DataFrame, model: Model, k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id", qidCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = assign(corpus, model, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("cvec"), col("list_id"))
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("qvec"),
        explode(topCentroids(col(vecCol), model.lit, lit(nprobe))).as("list_id"))
    val scored = c.join(q, "list_id")
      .select(col("query_id"), col("id"),
        cosineSim(col("cvec"), col("qvec")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}

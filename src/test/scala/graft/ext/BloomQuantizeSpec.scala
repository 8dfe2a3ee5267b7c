package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomFunctions.{bloomBuild, bloomMightContain}
import graft.functions.BloomProbe

class BloomQuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("bloom: no false negatives, few false positives, mergeable") {
    val members = (0L until 2000L).map(_ * 3L)
    val bitset = members.toDF("k")
      .agg(bloomBuild(xxhash64(col("k")), 1 << 16, 5)).head().getAs[Array[Byte]](0)
    // every member answers true — the exactness contract
    val words = BloomProbe.fromBytes(bitset)
    assert(words.length === (1 << 16) / 64)
    val probed = members.toDF("k")
      .filter(bloomMightContain(lit(bitset), xxhash64(col("k")), 5)).count()
    assert(probed === members.length.toLong)
    // non-members: fpp well under 5% at this load factor (2000 keys / 64k bits)
    val nonMembers = (0L until 2000L).map(_ * 3L + 1L)
    val fp = nonMembers.toDF("k")
      .filter(bloomMightContain(lit(bitset), xxhash64(col("k")), 5)).count()
    assert(fp < 100, s"false-positive count $fp out of 2000")
  }

  test("bloom: partial buffers OR together (distributed build = serial build)") {
    val df = (0L until 1000L).toDF("k").repartition(8)
    val distributed = df.agg(bloomBuild(xxhash64(col("k")), 1 << 14, 5))
      .head().getAs[Array[Byte]](0)
    val serial = (0L until 1000L).toDF("k").coalesce(1)
      .agg(bloomBuild(xxhash64(col("k")), 1 << 14, 5))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(distributed, serial))
  }

  test("bloom-pruned semi join equals the plain semi join") {
    val sfDir = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
    val dim = graft.core.Tables.load(spark, sfDir, "customer")
      .filter(col("c_acctbal") > 8000)
    val pruned = BloomPrune.semiJoinPruned(orders, dim, "o_custkey", "c_custkey")
      .select("o_orderkey").orderBy("o_orderkey").collect()
    val plain = orders.join(dim, orders("o_custkey") === dim("c_custkey"), "left_semi")
      .select("o_orderkey").orderBy("o_orderkey").collect()
    assert(pruned.toSeq === plain.toSeq)
    assert(pruned.nonEmpty)
  }

  test("quantize: reconstruction error bounded by scale/2; zero vector safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.75f)),
      (2L, Array(100.0f, -50.0f, 0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(df)
    val checked = q.select(
        col("vec_id"), col("qscale"),
        array_max(transform(
          zip_with(
            Quantize.dequantized(col("qvec"), col("qscale")),
            transform(col("embedding"), _.cast("double")),
            (a, b) => a - b),
          x => abs(x))).as("max_err"),
        array_max(transform(col("qvec"), x => abs(x))).as("max_code"))
      .collect()
    checked.foreach { r =>
      val scale = r.getDouble(1)
      assert(r.getDouble(2) <= scale / 2 + 1e-12,
        s"vec ${r.getLong(0)}: err ${r.getDouble(2)} > scale/2 $scale")
      assert(r.getLong(3) <= 127L)
    }
  }

  test("quantize: dequant cosine tracks exact cosine on real embeddings") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Quantize.quantizeInt8(emb).select("vec_id", "embedding", "qvec", "qscale")
    val a = q.filter(col("vec_id") < 5)
      .select(col("vec_id").as("ida"), col("embedding").as("va"),
        col("qvec").as("qa"), col("qscale").as("sa"))
    val b = q.filter(col("vec_id").between(5, 9))
      .select(col("vec_id").as("idb"), col("embedding").as("vb"),
        col("qvec").as("qb"), col("qscale").as("sb"))
    val rows = a.crossJoin(b).select(
        graft.functions.VectorFunctions.cosineSim(col("va"), col("vb")).as("exact"),
        Quantize.dequantCosine(col("qa"), col("sa"), col("qb"), col("sb")).as("approx"))
      .collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"cosine drift ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("hll sketch estimates merge and stay within 5% of exact") {
    val c = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "customer")
    val sk = c.groupBy(col("c_mktsegment")).agg(
      expr("hll_sketch_agg(c_custkey)").as("sk"),
      countDistinct(col("c_custkey")).as("exact"))
    val per = sk.select(col("c_mktsegment"),
      expr("hll_sketch_estimate(sk)").as("est"), col("exact")).collect()
    per.foreach { r =>
      val est = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
    val merged = sk.agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0)
    val exactAll = c.select(countDistinct(col("c_custkey"))).head().getLong(0)
    assert(math.abs(merged - exactAll).toDouble / exactAll < 0.05)
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.MaterializedRollup
import graft.plans.RollupViewRewrite

/** [[StreamingRollup]]: micro-batch maintenance of an X91 rollup. Pins
  * (1) the maintained rollup ≡ a from-scratch build over everything that
  * has streamed (integer measures, exact), (2) replay idempotence — a
  * re-fired batch replaces its own partials partition and re-merges to a
  * bit-identical rollup (foreachBatch is at-least-once and a naive merge
  * would double-count), (3) the real streaming wrapper end-to-end over a
  * MemoryStream, with the rewrite answering from the maintained file. */
class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_sr").toString

  private val b0 = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L))
  private val b1 = Seq(("a", 100L, -7L), ("c", 4L, 4L))
  private val b2 = Seq(("b", -1L, 0L), ("c", 40L, 9L))

  private def rollupRows(mvPath: String): Seq[String] =
    spark.read.parquet(mvPath).collect().map(_.toString).sorted.toSeq

  test("maintained rollup equals a from-scratch build; replay is idempotent") {
    val (partials, mv) = (tmp() + "/p", tmp() + "/mv")
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamingRollup.processBatch(b.toDF("k", "v", "w"), i.toLong,
        keys = Seq("k"), measures = Seq("v", "w"), partials, mv)
    }
    val want = MaterializedRollup.build(
      (b0 ++ b1 ++ b2).toDF("k", "v", "w"), Seq("k"), Seq("v", "w"))
      .collect().map(_.toString).sorted.toSeq
    assert(rollupRows(mv) === want)

    // replay batch 1 (at-least-once): partition replaced, rollup unchanged
    StreamingRollup.processBatch(b1.toDF("k", "v", "w"), 1L,
      keys = Seq("k"), measures = Seq("v", "w"), partials, mv)
    assert(rollupRows(mv) === want)
    // a replay with DIFFERENT content for the same batch id supersedes it
    // (the partition is the batch's single source of truth)
    StreamingRollup.processBatch(b1.take(1).toDF("k", "v", "w"), 1L,
      keys = Seq("k"), measures = Seq("v", "w"), partials, mv)
    val wantSuperseded = MaterializedRollup.build(
      (b0 ++ b1.take(1) ++ b2).toDF("k", "v", "w"), Seq("k"), Seq("v", "w"))
      .collect().map(_.toString).sorted.toSeq
    assert(rollupRows(mv) === wantSuperseded)
  }

  test("MemoryStream end-to-end: the rewrite answers from the maintained rollup") {
    val root = tmp()
    val (partials, mv, ckpt) = (s"$root/p", s"$root/mv", s"$root/ckpt")
    try {
      // a base table the registered view nominally fronts (the stream IS
      // its append feed in this contract)
      (b0 ++ b1).toDF("k", "v", "w")
        .write.mode("overwrite").parquet(s"$root/base")
      val mem = MemoryStream[(String, Long, Long)](spark)
      val q = StreamingRollup.start(mem.toDF().toDF("k", "v", "w"),
        keys = Seq("k"), measures = Seq("v", "w"), partials, mv, ckpt,
        registerAs = Some("sr_view"), basePath = s"$root/base")
      try {
        mem.addData(b0: _*); q.processAllAvailable()
        mem.addData(b1: _*); q.processAllAvailable()
      } finally q.stop()

      val base = spark.read.parquet(s"$root/base")
      val agg = base.groupBy($"k").agg(
        count(lit(1)).as("c"), sum($"v").as("sv"), avg($"v").as("av"),
        min($"w").as("mnw"), max($"w").as("mxw"))
      val scanned = agg.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
      assert(scanned.exists(_.contains(mv)) && !scanned.exists(_.contains("base")))
      val got = agg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(RollupViewRewrite.EnabledKey, "false")
      val want =
        try base.groupBy($"k").agg(
          count(lit(1)).as("c"), sum($"v").as("sv"), avg($"v").as("av"),
          min($"w").as("mnw"), max($"w").as("mxw"))
          .collect().map(_.toString).sorted.toSeq
        finally spark.conf.unset(RollupViewRewrite.EnabledKey)
      assert(got === want)
    } finally {
      RollupViewRewrite.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}

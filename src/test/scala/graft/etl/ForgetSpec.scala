package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Forget]]: surgical key erasure from a partitioned table. Pins the
  * three contract points — survivors exactly match a global filter,
  * UNAFFECTED partitions' files are byte-identical (path+size+mtime),
  * fully-deleted partitions disappear — plus null-safe key semantics,
  * the no-hit fast path, and the audit report arithmetic. */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private def files(dir: String): Set[(String, Long, Long)] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).map(f => (f.getAbsolutePath.stripPrefix(root.getAbsolutePath),
      f.length(), f.lastModified())).toSet
  }

  test("deletes surgically: survivors exact, untouched partitions byte-identical") {
    val root = Files.createTempDirectory("graft_forget").toString
    val rows = Seq(
      ("en", 1L, "a"), ("en", 2L, "b"), ("en", 3L, "c"),
      ("de", 4L, "d"), ("de", 5L, "e"),
      ("fr", 6L, "f"), ("fr", 7L, "g"),
      ("zh", 8L, "h")) // zh will be fully deleted
    rows.toDF("lang", "id", "payload")
      .write.partitionBy("lang").parquet(s"$root/t")
    val frBefore = files(s"$root/t/lang=fr")

    val report = Forget.deleteKeys(spark, s"$root/t", "lang", "id",
      Seq(2L, 3L, 5L, 8L, 999L).toDF("id"))

    // survivors = global filter result
    val got = spark.read.parquet(s"$root/t")
      .select($"lang", $"id", $"payload").as[(String, Long, String)]
      .collect().sortBy(_._2).toSeq
    assert(got === rows.filterNot(r => Set(2L, 3L, 5L, 8L)(r._2))
      .map { case (l, i, p) => (l, i, p) }.sortBy(_._2))
    // fr had no hits: not in the report, files untouched
    assert(files(s"$root/t/lang=fr") === frBefore)
    assert(!report.partitions.exists(_.partition == "fr"))
    // zh fully deleted: directory gone
    assert(!new java.io.File(s"$root/t/lang=zh").exists())
    // report arithmetic
    assert(report.deletedTotal === 4)
    assert(report.removedPartitions === 1)
    assert(report.partitions.map(p => (p.partition, p.rowsBefore, p.deleted,
      p.rowsAfter)).toSet === Set(("en", 3L, 2L, 1L), ("de", 2L, 1L, 1L),
      ("zh", 1L, 1L, 0L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("null keys erase null-keyed rows; no-hit delete touches nothing") {
    val root = Files.createTempDirectory("graft_forget2").toString
    Seq((1, Some(10L)), (1, None), (2, Some(20L)))
      .toDF("p", "k")
      .write.partitionBy("p").parquet(s"$root/t")
    val before = files(s"$root/t")

    // no-hit: report empty, zero filesystem churn
    val miss = Forget.deleteKeys(spark, s"$root/t", "p", "k",
      Seq(Some(99L)).toDF("k"))
    assert(miss.partitions.isEmpty && files(s"$root/t") === before)

    // null key in the delete set removes the NULL-keyed row only
    val report = Forget.deleteKeys(spark, s"$root/t", "p", "k",
      Seq(Option.empty[Long]).toDF("k"))
    assert(report.deletedTotal === 1)
    val left = spark.read.parquet(s"$root/t")
      .select($"p", $"k").as[(Int, Option[Long])].collect().toSet
    assert(left === Set((1, Some(10L)), (2, Some(20L))))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("partition values with special characters swap the right directory") {
    val root = Files.createTempDirectory("graft_forget4").toString
    // a space and an '=' force hive escaping in the directory name
    Seq(("a b", 1L), ("a b", 2L), ("c=d", 3L)).toDF("p", "id")
      .write.partitionBy("p").parquet(s"$root/t")
    val report = Forget.deleteKeys(spark, s"$root/t", "p", "id",
      Seq(1L).toDF("id"))
    assert(report.deletedTotal === 1)
    val left = spark.read.parquet(s"$root/t")
      .select($"p", $"id").as[(String, Long)].collect().toSet
    assert(left === Set(("a b", 2L), ("c=d", 3L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("timestamp partition values render to the writer's directory names") {
    val root = Files.createTempDirectory("graft_forget_ts").toString
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 12:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2026-01-01 12:00:00"), 2L),
      (java.sql.Timestamp.valueOf("2026-02-01 00:30:00"), 3L))
    rows.toDF("ts", "id").write.partitionBy("ts").parquet(s"$root/t")
    val report = Forget.deleteKeys(spark, s"$root/t", "ts", "id",
      Seq(1L).toDF("id"))
    assert(report.deletedTotal === 1)
    val left = spark.read.parquet(s"$root/t").select($"id")
      .as[Long].collect().toSet
    assert(left === Set(2L, 3L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("erasure invalidates registered rollups over the same base") {
    val root = Files.createTempDirectory("graft_forget_mv").toString
    Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 5.0))
      .toDF("p", "id", "v").write.partitionBy("p").parquet(s"$root/t")
    MaterializedRollup.createAndRegister(spark, "forget_mv", s"$root/t",
      s"$root/mv", keys = Seq("p"), measures = Seq("v"))
    val base = spark.read.parquet(s"$root/t")
    assert(base.agg(sum($"v")).collect().head.getDouble(0) === 35.0)
    Forget.deleteKeys(spark, s"$root/t", "p", "id", Seq(2L).toDF("id"))
    // the rollup would still say 35; erasure must have unregistered it
    assert(!graft.plans.RollupViewRewrite.registered.exists(_.name == "forget_mv"))
    assert(spark.read.parquet(s"$root/t")
      .agg(sum($"v")).collect().head.getDouble(0) === 15.0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("expirePartitions ages out partitions whose retain predicate is NULL") {
    val root = Files.createTempDirectory("graft_expire_null").toString
    Seq((Some("2026-01-01"), 1L), (None, 2L), (Some("2026-03-01"), 3L))
      .toDF("day", "id").write.partitionBy("day").parquet(s"$root/t")
    // null day: retain evaluates to NULL -> expires rather than lingering
    val expired = Forget.expirePartitions(spark, s"$root/t", "day",
      col("day") >= "2026-02-01")
    assert(expired.map(_.partition).toSet ===
      Set("2026-01-01", "__HIVE_DEFAULT_PARTITION__"))
    assert(spark.read.parquet(s"$root/t").select($"id").as[Long]
      .collect().toSet === Set(3L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("expirePartitions drops failing partitions whole, retains the rest") {
    val root = Files.createTempDirectory("graft_expire").toString
    Seq(("2026-01-01", 1L), ("2026-01-01", 2L), ("2026-02-01", 3L),
      ("2026-03-01", 4L)).toDF("day", "id")
      .write.partitionBy("day").parquet(s"$root/t")
    val keepBefore = files(s"$root/t/day=2026-03-01")
    val expired = Forget.expirePartitions(spark, s"$root/t", "day",
      col("day") >= "2026-02-01")
    assert(expired.map(e => (e.partition, e.rowsDropped)) ===
      Seq(("2026-01-01", 2L)))
    assert(!new java.io.File(s"$root/t/day=2026-01-01").exists())
    assert(files(s"$root/t/day=2026-03-01") === keepBefore)
    assert(spark.read.parquet(s"$root/t").count() === 2)
    // idempotent: nothing left to expire
    assert(Forget.expirePartitions(spark, s"$root/t", "day",
      col("day") >= "2026-02-01").isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("expirePartitions invalidates registered rollups over the same base") {
    val root = Files.createTempDirectory("graft_expire_mv").toString
    Seq(("2026-01-01", 1L, 10.0), ("2026-02-01", 2L, 20.0))
      .toDF("day", "id", "v").write.partitionBy("day").parquet(s"$root/t")
    MaterializedRollup.createAndRegister(spark, "expire_mv", s"$root/t",
      s"$root/mv", keys = Seq("day"), measures = Seq("v"))
    Forget.expirePartitions(spark, s"$root/t", "day",
      col("day") >= "2026-02-01")
    // the rollup still aggregates the retired day; the sweep must have
    // unregistered it so base queries stop being rerouted there
    assert(!graft.plans.RollupViewRewrite.registered.exists(_.name == "expire_mv"))
    assert(spark.read.parquet(s"$root/t")
      .agg(sum($"v")).collect().head.getDouble(0) === 20.0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("crashed mid-swap run is recovered: moved-aside partition restored") {
    val root = Files.createTempDirectory("graft_forget_crash").toString
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("p", "id")
      .write.partitionBy("p").parquet(s"$root/t")
    // simulate the crash window of a PRIOR run: partition p=a was moved
    // aside to staging/__old but its replacement never landed — the only
    // full copy of a's survivors sits in staging, which an unguarded run
    // would clear first
    val staging = s"$root/t__forget_tmp"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$staging/__old"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/t/p=a"),
      new org.apache.hadoop.fs.Path(s"$staging/__old/p=a")))
    assert(spark.read.parquet(s"$root/t").count() === 1) // a is missing

    // the next run's recovery preamble must restore p=a BEFORE clearing
    // staging; the delete then proceeds against the recovered table
    val report = Forget.deleteKeys(spark, s"$root/t", "p", "id",
      Seq(1L).toDF("id"))
    assert(report.deletedTotal === 1)
    val left = spark.read.parquet(s"$root/t")
      .select($"p", $"id").as[(String, Long)].collect().toSet
    assert(left === Set(("a", 2L), ("b", 3L)))
    assert(!new java.io.File(staging).exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("multi-level partitioning: erasure rewrites only the hit LEAF") {
    val root = Files.createTempDirectory("graft_forget_ml").toString
    val rows = Seq(
      ("2026-01-01", 0, 1L), ("2026-01-01", 0, 2L), ("2026-01-01", 1, 3L),
      ("2026-01-02", 0, 4L), ("2026-01-02", 1, 5L), ("2026-01-02", 1, 6L))
    rows.toDF("day", "hour", "id")
      .write.partitionBy("day", "hour").parquet(s"$root/t")
    // sibling leaf of the same day must stay byte-identical
    val sibling = files(s"$root/t/day=2026-01-01/hour=1")
    val report = Forget.deleteKeys(spark, s"$root/t", Seq("day", "hour"),
      "id", Seq(1L, 5L, 6L).toDF("id"))
    assert(report.deletedTotal === 3)
    assert(report.partitions.map(p =>
      (p.partition, p.deleted, p.rowsAfter)).toSet ===
      Set(("2026-01-01/0", 1L, 1L), ("2026-01-02/1", 2L, 0L)))
    assert(files(s"$root/t/day=2026-01-01/hour=1") === sibling)
    // fully-deleted leaf gone; the rest of its day intact
    assert(!new java.io.File(s"$root/t/day=2026-01-02/hour=1").exists())
    val left = spark.read.parquet(s"$root/t")
      .select($"day", $"hour", $"id").as[(String, Int, Long)]
      .collect().toSet
    assert(left === Set(("2026-01-01", 0, 2L), ("2026-01-01", 1, 3L),
      ("2026-01-02", 0, 4L)))

    // multi-level expiry: whole leaves by composite predicate
    val expired = Forget.expirePartitions(spark, s"$root/t",
      Seq("day", "hour"), !(col("day") === "2026-01-01" && col("hour") === 0))
    assert(expired.map(e => (e.partition, e.rowsDropped)) ===
      Seq(("2026-01-01/0", 1L)))
    assert(spark.read.parquet(s"$root/t").count() === 2)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("completed-swap aside is garbage, not salvage: no resurrection, no duplicates") {
    // the OTHER crash window: a leaf's swap fully completed (replacement
    // installed) but its aside was still on disk when the run died. The
    // aside holds the deleted keys; recovery must DELETE it — renaming its
    // part-files into the live rewritten leaf would resurrect the erased
    // keys and duplicate every survivor row.
    val root = Files.createTempDirectory("graft_forget_postswap").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L)).toDF("p", "id")
      .write.partitionBy("p").parquet(s"$root/t")
    val staging = s"$root/t__forget_tmp"
    // old copy (still containing the erased id=1) sits under __old …
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$staging/__old"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/t/p=a"),
      new org.apache.hadoop.fs.Path(s"$staging/__old/p=a")))
    // … while the rewritten leaf (survivors 2,3 — fresh UUID file names)
    // is already installed in the table
    Seq(("a", 2L), ("a", 3L)).toDF("p", "id")
      .write.mode("append").partitionBy("p").parquet(s"$root/t")

    // any next run's preamble must sweep the aside, not merge it
    val report = Forget.deleteKeys(spark, s"$root/t", "p", "id",
      Seq(999L).toDF("id")) // no-hit: only recovery runs
    assert(report.partitions.isEmpty)
    val left = spark.read.parquet(s"$root/t")
      .select($"p", $"id").as[(String, Long)].collect().toSeq.sorted
    assert(left === Seq(("a", 2L), ("a", 3L), ("b", 4L))) // 1 stays erased, 2/3 not duplicated
    assert(!new java.io.File(s"$staging/__old/p=a").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("multi-level recovery: completed-swap leaf swept, in-flight sibling restored") {
    val root = Files.createTempDirectory("graft_forget_mixed").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq(("d1", 0, 1L), ("d1", 0, 2L), ("d1", 1, 3L), ("d2", 0, 4L))
      .toDF("day", "hour", "id")
      .write.partitionBy("day", "hour").parquet(s"$root/t")
    val staging = s"$root/t__forget_tmp"
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$staging/__old/day=d1"))
    // leaf d1/0: swap COMPLETED — old copy (with erased id=1) aside, new
    // copy (id=2 only) live
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/t/day=d1/hour=0"),
      new org.apache.hadoop.fs.Path(s"$staging/__old/day=d1/hour=0")))
    Seq(("d1", 0, 2L)).toDF("day", "hour", "id")
      .write.mode("append").partitionBy("day", "hour").parquet(s"$root/t")
    // leaf d1/1: swap IN FLIGHT — aside is the only copy
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/t/day=d1/hour=1"),
      new org.apache.hadoop.fs.Path(s"$staging/__old/day=d1/hour=1")))

    val report = Forget.deleteKeys(spark, s"$root/t", Seq("day", "hour"),
      "id", Seq(999L).toDF("id"))
    assert(report.partitions.isEmpty)
    val left = spark.read.parquet(s"$root/t")
      .select($"day", $"hour", $"id").as[(String, Int, Long)]
      .collect().toSet
    // d1/0 kept the rewritten copy only; d1/1 came back whole
    assert(left === Set(("d1", 0, 2L), ("d1", 1, 3L), ("d2", 0, 4L)))
    assert(!new java.io.File(s"$staging/__old/day=d1").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("expirePartitions recovers a crashed swap before sweeping") {
    // a crashed deleteKeys left a leaf moved aside; the sweep must restore
    // it FIRST so it can be retired — otherwise the next deleteKeys would
    // resurrect a partition the sweep should have expired
    val root = Files.createTempDirectory("graft_expire_crash").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq(("2026-01-01", 1L), ("2026-02-01", 2L)).toDF("day", "id")
      .write.partitionBy("day").parquet(s"$root/t")
    val staging = s"$root/t__forget_tmp"
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$staging/__old"))
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$root/t/day=2026-01-01"),
      new org.apache.hadoop.fs.Path(s"$staging/__old/day=2026-01-01")))

    val expired = Forget.expirePartitions(spark, s"$root/t", "day",
      col("day") >= "2026-02-01")
    assert(expired.map(e => (e.partition, e.rowsDropped)) ===
      Seq(("2026-01-01", 1L)))
    assert(spark.read.parquet(s"$root/t").select($"id").as[Long]
      .collect().toSet === Set(2L))
    // nothing left aside for a later deleteKeys to resurrect
    assert(!new java.io.File(s"$staging/__old/day=2026-01-01").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("multi-level crash recovery restores the moved-aside leaf") {
    val root = Files.createTempDirectory("graft_forget_mlc").toString
    Seq(("d1", 0, 1L), ("d1", 1, 2L), ("d2", 0, 3L)).toDF("day", "hour", "id")
      .write.partitionBy("day", "hour").parquet(s"$root/t")
    val staging = s"$root/t__forget_tmp"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$staging/__old/day=d1"))
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$root/t/day=d1/hour=0"),
      new org.apache.hadoop.fs.Path(s"$staging/__old/day=d1/hour=0")))
    // next run restores the leaf at the right depth, then erases
    val report = Forget.deleteKeys(spark, s"$root/t", Seq("day", "hour"),
      "id", Seq(1L).toDF("id"))
    assert(report.deletedTotal === 1)
    val left = spark.read.parquet(s"$root/t")
      .select($"day", $"hour", $"id").as[(String, Int, Long)]
      .collect().toSet
    assert(left === Set(("d1", 1, 2L), ("d2", 0, 3L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("integer partition values and repeated erasure are handled") {
    val root = Files.createTempDirectory("graft_forget3").toString
    Seq.tabulate(20)(i => (i % 4, i.toLong)).toDF("bucket", "id")
      .write.partitionBy("bucket").parquet(s"$root/t")
    val r1 = Forget.deleteKeys(spark, s"$root/t", "bucket", "id",
      Seq(0L, 1L, 2L, 3L).toDF("id"))
    assert(r1.deletedTotal === 4 && r1.partitions.size === 4)
    // idempotent: the same keys again hit nothing
    val r2 = Forget.deleteKeys(spark, s"$root/t", "bucket", "id",
      Seq(0L, 1L, 2L, 3L).toDF("id"))
    assert(r2.partitions.isEmpty)
    assert(spark.read.parquet(s"$root/t").count() === 16)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}

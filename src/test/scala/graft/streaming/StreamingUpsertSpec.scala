package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches fold into a snapshot; later versions win") {
    val root = Files.createTempDirectory("graft_supsert").toString
    val snap = s"$root/snap"

    // batch 0: initial keys
    val b0 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v")
    StreamingUpsert.applyBatch(spark, b0, 0L, Seq("k"), "v", snap)
    // batch 1: update k=2 (two conflicting rows — higher v wins), add k=3
    val b1 = Seq((2L, "B-v3", 3L), (2L, "B-v2", 2L), (3L, "c", 2L))
      .toDF("k", "s", "v")
    StreamingUpsert.applyBatch(spark, b1, 1L, Seq("k"), "v", snap)

    val got = StreamingUpsert.currentSnapshot(spark, snap).get
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "a", 1L), (2L, "B-v3", 3L), (3L, "c", 2L)))
  }

  test("replayed batch is idempotent; old versions readable until vacuum") {
    val root = Files.createTempDirectory("graft_supsert2").toString
    val snap = s"$root/snap"
    val b0 = Seq((1L, "a", 1L)).toDF("k", "s", "v")
    val b1 = Seq((1L, "a2", 2L)).toDF("k", "s", "v")
    StreamingUpsert.applyBatch(spark, b0, 0L, Seq("k"), "v", snap)
    StreamingUpsert.applyBatch(spark, b1, 1L, Seq("k"), "v", snap)
    // replay batch 1 (restart-after-commit): same result, no duplication
    StreamingUpsert.applyBatch(spark, b1, 1L, Seq("k"), "v", snap)
    val cur = StreamingUpsert.currentSnapshot(spark, snap).get
    assert(cur.count() === 1)
    assert(cur.as[(Long, String, Long)].collect().head === ((1L, "a2", 2L)))
    // time travel: v=0 still readable, then vacuumed away
    assert(spark.read.parquet(s"$snap/v=0").count() === 1)
    StreamingUpsert.vacuum(spark, snap)
    assert(!new java.io.File(s"$snap/v=0").exists())
    assert(StreamingUpsert.currentSnapshot(spark, snap).get.count() === 1)
  }

  test("end-to-end through a real stream equals the batch fold") {
    val root = Files.createTempDirectory("graft_supsert3").toString
    val src = s"$root/src"
    val snap = s"$root/snap"
    val all = Seq(
      (1L, "a", 1L), (2L, "b", 1L),
      (2L, "B", 2L), (3L, "c", 1L),
      (1L, "A", 3L), (4L, "d", 1L))
    all.toDF("k", "s", "v").repartition(3).write.parquet(src)
    val stream = spark.readStream
      .schema(all.toDF("k", "s", "v").schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = StreamingUpsert.run(stream, Seq("k"), "v", snap, s"$root/ckpt")
    q.processAllAvailable()
    q.stop()
    val got = StreamingUpsert.currentSnapshot(spark, snap).get
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    // whatever the batch slicing, the latest version per key must win
    val expect = all.groupBy(_._1).map(_._2.maxBy(_._3)).toSeq.sortBy(_._1)
    assert(got === expect)
  }

  test("retention vacuum keeps a time-travel window; snapshotAt guards") {
    val root = Files.createTempDirectory("graft_supsert4").toString
    val snap = s"$root/snap"
    (0 to 4).foreach { i =>
      StreamingUpsert.applyBatch(spark,
        Seq((1L, s"s$i", i.toLong)).toDF("k", "s", "v"),
        i.toLong, Seq("k"), "v", snap)
    }
    // keep = 3 → current (v=4) plus the two newest older versions survive
    StreamingUpsert.vacuum(spark, snap, keep = 3)
    assert(!new java.io.File(s"$snap/v=0").exists())
    assert(!new java.io.File(s"$snap/v=1").exists())
    assert(new java.io.File(s"$snap/v=2").exists())
    assert(new java.io.File(s"$snap/v=3").exists())
    // retained versions time-travel correctly
    assert(StreamingUpsert.snapshotAt(spark, snap, 3L)
      .as[(Long, String, Long)].collect().head === ((1L, "s3", 3L)))
    // vacuumed and unpublished versions both refuse
    intercept[IllegalArgumentException] {
      StreamingUpsert.snapshotAt(spark, snap, 0L)
    }
    intercept[IllegalArgumentException] {
      StreamingUpsert.snapshotAt(spark, snap, 99L)
    }
    // default keep=1 collapses to current-only (previous behavior)
    StreamingUpsert.vacuum(spark, snap)
    assert(!new java.io.File(s"$snap/v=3").exists())
    assert(StreamingUpsert.currentSnapshot(spark, snap).get.count() === 1)
  }

  test("changes() reads the CDC between two retained versions") {
    val root = Files.createTempDirectory("graft_supsert5").toString
    val snap = s"$root/snap"
    StreamingUpsert.applyBatch(spark,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v"),
      0L, Seq("k"), "v", snap)
    StreamingUpsert.applyBatch(spark,
      Seq((2L, "B", 2L), (3L, "c", 1L)).toDF("k", "s", "v"),
      1L, Seq("k"), "v", snap)
    val got = StreamingUpsert.changes(spark, snap, 0L, 1L, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got === Seq((2L, "changed"), (3L, "added")))
    // inverted range refuses
    intercept[IllegalArgumentException] {
      StreamingUpsert.changes(spark, snap, 1L, 0L, Seq("k"))
    }
  }
}

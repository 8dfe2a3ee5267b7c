package graft.streaming

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.util.Try

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 concurrent-writer safety: the [[CommitLog]] CAS primitive
  * and the fenced [[StreamingUpsert.applyBatch]] on top of it. These are
  * REAL races (threads through link(2)-backed exclusive create), not
  * mocked interleavings. */
class CommitLogSpec extends SparkSpec {
  import spark.implicits._

  test("tryCommit: exactly one of N racing writers wins each epoch") {
    val dir = Files.createTempDirectory("graft_clog").toString
    val n = 8
    val pool = Executors.newFixedThreadPool(n)
    try {
      (0 until 3).foreach { epoch =>
        val start = new CountDownLatch(1)
        val results = (0 until n).map { w =>
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = {
              start.await()
              CommitLog.tryCommit(spark, dir, epoch.toLong, s"v=w$w-$epoch")
            }
          })
        }
        start.countDown()
        val wins = results.map(_.get(30, TimeUnit.SECONDS)).count(identity)
        assert(wins === 1, s"epoch ${epoch + 1}: expected exactly 1 winner")
      }
      // the log is dense 1..3 and every commit file parses — no torn
      // pointer can exist because a commit is linked only after its
      // content is fully written
      val log = CommitLog.commits(spark, dir)
      assert(log.map(_.epoch) === Seq(1L, 2L, 3L))
      assert(log.forall(_.version.matches("v=w\\d+-\\d+")))
      // a stale expected epoch can never publish
      assert(!CommitLog.tryCommit(spark, dir, 0L, "v=late"))
    } finally pool.shutdownNow()
  }

  test("two interleaved writers: no lost update, no torn pointer") {
    val root = Files.createTempDirectory("graft_clog2").toString
    val snap = s"$root/snap"
    val batchesPerWriter = 4
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def writer(tag: String, keyBase: Long) =
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          start.await()
          (0 until batchesPerWriter).foreach { b =>
            val df = Seq((keyBase + b, s"$tag-$b", b.toLong))
              .toDF("k", "s", "v")
            StreamingUpsert.applyBatch(spark, df, b.toLong,
              Seq("k"), "v", snap, writerTag = tag, maxRetries = 50)
          }
        }
      })
    try {
      val a = writer("wa", 100L)
      val b = writer("wb", 200L)
      start.countDown()
      a.get(120, TimeUnit.SECONDS)
      b.get(120, TimeUnit.SECONDS)
    } finally pool.shutdownNow()

    // no lost update: the final snapshot holds EVERY key either writer
    // folded — under an unfenced last-write-wins pointer the loser's
    // whole fold would vanish whenever both computed from the same base
    val got = StreamingUpsert.currentSnapshot(spark, snap).get
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    val expect = ((0 until batchesPerWriter).map(b => (100L + b, s"wa-$b", b.toLong)) ++
      (0 until batchesPerWriter).map(b => (200L + b, s"wb-$b", b.toLong)))
      .sortBy(_._1)
    assert(got === expect)

    // no torn pointer: dense epochs, every commit names a readable
    // complete directory, and each writer owns exactly its batch count
    val log = CommitLog.commits(spark, snap)
    assert(log.map(_.epoch) === (1L to (2L * batchesPerWriter)))
    log.foreach { c =>
      assert(spark.read.parquet(s"$snap/${c.version}").count() >= 1)
    }
    assert(log.count(_.version.startsWith("v=wa-")) === batchesPerWriter)
    assert(log.count(_.version.startsWith("v=wb-")) === batchesPerWriter)
  }

  test("replay guard is per writer; retry exhaustion surfaces the conflict") {
    val root = Files.createTempDirectory("graft_clog3").toString
    val snap = s"$root/snap"
    val b0 = Seq((1L, "a", 1L)).toDF("k", "s", "v")
    StreamingUpsert.applyBatch(spark, b0, 0L, Seq("k"), "v", snap,
      writerTag = "wa")
    // writer wb's batch 0 is NOT a replay of wa's batch 0
    StreamingUpsert.applyBatch(spark, Seq((2L, "b", 1L)).toDF("k", "s", "v"),
      0L, Seq("k"), "v", snap, writerTag = "wb")
    assert(StreamingUpsert.currentSnapshot(spark, snap).get.count() === 2)
    // wa's batch 0 IS a replay — no-op, no new epoch
    StreamingUpsert.applyBatch(spark, b0, 0L, Seq("k"), "v", snap,
      writerTag = "wa")
    assert(CommitLog.commits(spark, snap).size === 2)
    // a writer whose every publish loses (the log advances under it —
    // simulated by pre-taking its target epochs) aborts loudly instead
    // of publishing from a stale base
    val head = CommitLog.current(spark, snap).get.epoch
    (1L to 3L).foreach { i =>
      assert(CommitLog.tryCommit(spark, snap, head + i - 1, s"v=wa-0"))
    }
    // now wc computes from epoch head+3, but loses every CAS to this
    // interloper thread advancing the log between read and publish
    val interloper = new Thread(() => {
      var e = CommitLog.current(spark, snap).get.epoch
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
          !Thread.currentThread().isInterrupted) {
        if (CommitLog.tryCommit(spark, snap, e, "v=wa-0")) e += 1
        else e = CommitLog.current(spark, snap).get.epoch
      }
    })
    interloper.setDaemon(true)
    interloper.start()
    val thrown = Try {
      StreamingUpsert.applyBatch(spark,
        Seq((3L, "c", 1L)).toDF("k", "s", "v"), 0L, Seq("k"), "v", snap,
        writerTag = "wc", maxRetries = 2)
    }
    interloper.interrupt()
    interloper.join(5000)
    thrown.fold(
      e => assert(e.isInstanceOf[java.util.ConcurrentModificationException],
        s"expected ConcurrentModificationException, got $e"),
      _ => ()) // winning despite contention is also a legal outcome
  }

  test("legacy _CURRENT store resolves and migrates on next publish") {
    val root = Files.createTempDirectory("graft_clog4").toString
    val snap = s"$root/snap"
    // build a legacy-layout store by hand: v=0 data + _CURRENT pointer
    Seq((1L, "old", 1L)).toDF("k", "s", "v")
      .write.parquet(s"$snap/v=0")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$snap/_CURRENT"), "v=0")
    assert(StreamingUpsert.currentSnapshot(spark, snap).get.count() === 1)
    // next publish CASes against epoch 0 and starts the log at 1; the
    // old pointer is materialized as epoch 0 and _CURRENT retired, so
    // retention no longer has a stale pointer shadowing it forever
    StreamingUpsert.applyBatch(spark,
      Seq((2L, "new", 1L)).toDF("k", "s", "v"), 1L, Seq("k"), "v", snap)
    val log = CommitLog.commits(spark, snap)
    assert(log.map(_.epoch) === Seq(0L, 1L))
    assert(log.map(_.version) === Seq("v=0", "v=1"))
    assert(!new java.io.File(s"$snap/_CURRENT").exists())
    assert(StreamingUpsert.currentSnapshot(spark, snap).get.count() === 2)
    // pre-migration batches stay time-travelable
    assert(StreamingUpsert.snapshotAt(spark, snap, 0L).count() === 1)
    // ...until retention reclaims them: the legacy sweep deletes
    // pre-migration version dirs the window no longer covers
    StreamingUpsert.vacuum(spark, snap)
    assert(!new java.io.File(s"$snap/v=0").exists())
    assert(StreamingUpsert.currentSnapshot(spark, snap).get.count() === 2)
  }

  test("vacuum truncates the log but keeps every writer's replay guard") {
    val root = Files.createTempDirectory("graft_clog5").toString
    val snap = s"$root/snap"
    // writer wa commits batches 0..2, then wb commits 0..1
    (0 to 2).foreach { b =>
      StreamingUpsert.applyBatch(spark,
        Seq((100L + b, s"wa-$b", 1L)).toDF("k", "s", "v"),
        b.toLong, Seq("k"), "v", snap, writerTag = "wa")
    }
    (0 to 1).foreach { b =>
      StreamingUpsert.applyBatch(spark,
        Seq((200L + b, s"wb-$b", 1L)).toDF("k", "s", "v"),
        b.toLong, Seq("k"), "v", snap, writerTag = "wb")
    }
    assert(CommitLog.commits(spark, snap).size === 5)
    StreamingUpsert.vacuum(spark, snap) // keep = 1
    val left = CommitLog.commits(spark, snap)
    // head (wb-1) plus wa's newest (wa-2): everything else truncated
    assert(left.map(_.version).toSet === Set("v=wa-2", "v=wb-1"))
    // the replay guard still holds for BOTH writers after truncation
    StreamingUpsert.applyBatch(spark,
      Seq((999L, "replay", 9L)).toDF("k", "s", "v"),
      2L, Seq("k"), "v", snap, writerTag = "wa")
    StreamingUpsert.applyBatch(spark,
      Seq((999L, "replay", 9L)).toDF("k", "s", "v"),
      1L, Seq("k"), "v", snap, writerTag = "wb")
    assert(CommitLog.commits(spark, snap).map(_.version).toSet ===
      Set("v=wa-2", "v=wb-1")) // both were no-ops
    assert(StreamingUpsert.currentSnapshot(spark, snap).get
      .filter($"k" === 999L).count() === 0)
  }

  test("non-atomic-rename schemes are refused, not silently raced") {
    // s3a's Rename.NONE is check-then-act — the exact lost-update race
    // the log exists to prevent; the declared-scheme escape hatch is for
    // deployments fronted by an external fencing service
    val thrown = intercept[UnsupportedOperationException] {
      CommitLog.tryCommit(spark, "s3a://some-bucket/store", 0L, "v=0")
    }
    assert(thrown.getMessage.contains("s3a"))
    assert(thrown.getMessage.contains("atomic"))
  }
}

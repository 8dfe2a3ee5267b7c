package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core

/** Round-17 optimization probes (guide §1: measure first).
  *
  * Modes:
  *  - q60    — adjudicate the driver's 32-core q60_sessionize outlier
  *             (BENCH_r16: 4.24 s @32c vs 0.37 s @8c of the same binary):
  *             5 timed runs after 2 warm-ups, per-run wall time plus
  *             job/stage/task counts and per-stage max task time, at the
  *             session's own core count (set SPARK_GRAFT_CPUS).
  *  - media  — per-modality decomposition of x0_media_pipeline: encode,
  *             fingerprint-checkpoint (sequential vs concurrent), pairs,
  *             report, at the given SF dir.
  *  - bytes  — shuffle read/write bytes + rows for the r16 dedup rewrites
  *             (x36 line dedup, x37 span dedup) and x0_pipeline, new shape
  *             vs the pre-r16 shapes kept in R16Probe, via a stage-metrics
  *             listener (VERDICT r16 item 4: make the §8 claims numbers).
  *
  * Usage: R17Probe [sfDir] [q60|media|bytes|all]
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "all"
    val spark = core.Sessions.local(appName = "graft-r17probe")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRecords = new java.util.concurrent.atomic.AtomicLong
    // (stage id, name head, tasks, runtime ms) of the slowest stages
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          val dur = for {
            a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime
          } yield a - b
          stageLog.add((s.stageInfo.stageId,
            s.stageInfo.name.take(60), s.stageInfo.numTasks, dur.getOrElse(-1L)))
        }
      }
    })
    def resetCounters(): Unit = {
      jobs.set(0); tasks.set(0); stages.set(0)
      shufRead.set(0); shufWrite.set(0); shufRecords.set(0)
      stageLog.clear()
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(label: String, warmups: Int = 1, runs: Int = 3)(df: => DataFrame): Unit = {
      (1 to warmups).foreach(_ => noop(df))
      val ts = (1 to runs).map { _ =>
        resetCounters()
        val t0 = System.nanoTime()
        noop(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r17] $label%-44s med=${ts.sorted.apply(runs / 2)}%7.3f s  " +
        f"(all: ${ts.map(t => f"$t%.3f").mkString(" ")})  " +
        f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d " +
        f"shufW=${shufWrite.get / 1024}%8d KiB shufR=${shufRead.get / 1024}%8d KiB " +
        f"shufRecs=${shufRecords.get}%9d")
    }

    if (which == "all" || which == "q60") {
      val cores = spark.sparkContext.defaultParallelism
      println(s"[r17] q60 adjudication at $cores cores, sf=$sfDir")
      def q60 = graft.SparkEntry.queries("q60_sessionize")(spark, sfDir)
      // 2 warm-ups (JIT+codegen+listing), then 5 timed runs with stage data
      (1 to 2).foreach(_ => noop(q60))
      (1 to 5).foreach { i =>
        resetCounters()
        val t0 = System.nanoTime()
        noop(q60)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[r17]   run $i: $dt%7.3f s  jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get}")
        import scala.jdk.CollectionConverters._
        stageLog.asScala.toSeq.sortBy(-_._4).take(4).foreach { case (id, nm, nt, ms) =>
          println(f"[r17]     stage $id%4d $nm%-60s tasks=$nt%4d ${ms}ms")
        }
      }
      // cold-JVM-ish variant: clear cache + GC between runs (the bench's
      // isolation protocol) to see whether isolation state changes it
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      (1 to 3).foreach { i =>
        resetCounters()
        val t0 = System.nanoTime()
        noop(q60)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
        println(f"[r17]   isolated run $i: $dt%7.3f s  jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get}")
      }
    }

    if (which == "all" || which == "media") {
      println(s"[r17] media decomposition, sf=$sfDir, cores=" +
        spark.sparkContext.defaultParallelism)
      import spark.implicits._
      import graft.ext.Multimodal
      val ids0 = core.Tables.load(spark, sfDir, "documents")
        .filter(col("doc_id") < 450).select(col("doc_id")).as[Long]
        .repartition(math.min(450, spark.sparkContext.defaultParallelism))
      def seedOf(i: Long, g: Long): Long = if (i >= 360) 100000L else i % g
      val images = ids0.map { i =>
        val data =
          if (i % 75 == 74) Array[Byte](9, 9, 9)
          else graft.ext.ImageDedup.encodeSmoothPng(64, 48, seedOf(i, 120))
        Multimodal.MediaRow(i, s"img/$i", "image/png", data)
      }
      val audio = ids0.map { i =>
        val data =
          if (i % 75 == 74) Array[Byte](9, 9, 9)
          else graft.ext.AudioDedup.encodeToneWav(8000, 8000, seedOf(i, 90))
        Multimodal.MediaRow(i, s"wav/$i", "audio/wav", data)
      }
      val videos = ids0.map { i =>
        val data =
          if (i % 75 == 74) Array[Byte](9, 9, 9)
          else graft.ext.VideoDedup.encodeSyntheticVideo(32, 24, 8.0, 1.5, seedOf(i, 72))
        Multimodal.MediaRow(i, s"vid/$i", "video/gvid", data)
      }
      // encode-only cost per modality (count the bytes so nothing prunes)
      time("media encode img")(images.select(sum(length(col("data")))))
      time("media encode wav")(audio.select(sum(length(col("data")))))
      time("media encode vid")(videos.select(sum(length(col("data")))))
      // fingerprint (encode + decode) per modality
      time("media fp img")(graft.ext.ImageDedup.fingerprints(images))
      time("media fp wav")(graft.ext.AudioDedup.fingerprints(audio))
      time("media fp vid")(graft.ext.VideoDedup.fingerprints(videos))
      // checkpoint build: sequential vs concurrent (r16 shape)
      def buildSeq(): Unit = {
        val a = graft.ext.ImageDedup.fingerprints(images).localCheckpoint(true)
        val b = graft.ext.AudioDedup.fingerprints(audio).localCheckpoint(true)
        val c = graft.ext.VideoDedup.fingerprints(videos).localCheckpoint(true)
        Seq(a, b, c).foreach(_.unpersist(true))
      }
      def buildConc(): Unit = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        val dfs = Await.result(Future.sequence(Seq(
          Future(graft.ext.ImageDedup.fingerprints(images).localCheckpoint(true)),
          Future(graft.ext.AudioDedup.fingerprints(audio).localCheckpoint(true)),
          Future(graft.ext.VideoDedup.fingerprints(videos).localCheckpoint(true)))),
          Duration.Inf)
        dfs.foreach(_.unpersist(true))
      }
      buildSeq(); buildConc() // warm
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); buildSeq()
        val t1 = System.nanoTime(); buildConc()
        val t2 = System.nanoTime()
        println(f"[r17] media checkpoint seq=${(t1 - t0) / 1e9}%6.3f s  " +
          f"conc=${(t2 - t1) / 1e9}%6.3f s")
      }
      // whole flagship for reference
      time("media flagship whole", warmups = 1, runs = 3)(
        graft.SparkEntry.queries("x0_media_pipeline")(spark, sfDir))
    }

    if (which == "all" || which == "bytes") {
      println(s"[r17] shuffle-bytes audit (r16 dedup rewrites), sf=$sfDir")
      val docs = core.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      // line dedup: new (row-local rebuild) vs pre-r16 (text collect_list)
      time("bytes line NEW row-local")(
        graft.ext.LineDedup.dedupLines(docs, "doc_id", "text", 100L))
      time("bytes line OLD collect_list") {
        val maxOccurrences = 100L
        val lines = docs.select(col("doc_id"),
          posexplode(split(col("text"), "\n", -1)).as(Seq("__pos", "__line")))
        val heavy = lines
          .groupBy(xxhash64(col("__line")).as("__lh"))
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") > maxOccurrences)
          .select("__lh")
        lines
          .join(broadcast(heavy), xxhash64(col("__line")) === col("__lh"),
            "left_anti")
          .groupBy(col("doc_id"))
          .agg(array_join(
            transform(
              array_sort(collect_list(
                struct(col("__pos").as("p"), col("__line").as("l")))),
              x => x.getField("l")),
            "\n").as("text"))
      }
      // span dedup: new vs pre-r16 window shape
      time("bytes span NEW row-local")(
        graft.ext.SpanDedup.dedupSpans(docs, "doc_id", "text", k = 5))
      time("bytes span OLD window") {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.ColumnOps.letCol
        import graft.ext.TextStats
        val k = 5
        val toks = docs.select(col("doc_id"),
          posexplode(TextStats.tokens(col("text"))).as(Seq("__pos", "__tok")))
        val grams = docs.select(col("doc_id"), posexplode(
          letCol(TextStats.tokens(col("text"))) { t =>
            when(size(t) < k, array().cast("array<bigint>"))
              .otherwise(transform(sequence(lit(0), size(t) - k),
                i => xxhash64(concat_ws(" ", slice(t, i + 1, lit(k))))))
          }).as(Seq("__pos", "__gh")))
        val dup = grams.groupBy(col("__gh")).agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1).select("__gh")
        val starts = grams.join(broadcast(dup), Seq("__gh"))
          .select(col("doc_id"), col("__pos").as("__s"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
          .rangeBetween(-(k - 1), 0)
        val kept = toks.join(starts.groupBy("doc_id")
              .agg(collect_list(col("__s")).as("__ss")), Seq("doc_id"), "left")
          .withColumn("__cov",
            exists(coalesce(col("__ss"), array().cast("array<int>")),
              s => s.between(col("__pos") - (k - 1), col("__pos"))))
          .filter(!col("__cov"))
        kept.groupBy(col("doc_id"))
          .agg(array_join(transform(array_sort(collect_list(
            struct(col("__pos").as("p"), col("__tok").as("t")))),
            x => x.getField("t")), " ").as("text"))
      }
      // flagship end-to-end bytes
      time("bytes x0_pipeline", warmups = 1, runs = 1)(
        graft.SparkEntry.queries("x0_pipeline")(spark, sfDir))
    }

    if (which == "spanhash") {
      // gram-hash kernel A/B: the x37/x0_pipeline span stage is gram-
      // hashing bound (guide §1.2 step 2 — per-task work). A = current
      // slice+concat_ws+xxhash64 (hashes the gram STRING); B = multi-arg
      // xxhash64 over the k tokens (no slice array, no concat string —
      // same gram-identity classes because tokens are whitespace-free, so
      // " "-concat is injective over token sequences).
      import graft.functions.ColumnOps.letCol
      import graft.ext.TextStats
      val docs = core.Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      for (k <- Seq(5, 8)) {
        def countA = {
          val g = letCol(TextStats.tokens(col("text"))) { toks =>
            when(size(toks) < k, array().cast("array<bigint>"))
              .otherwise(transform(sequence(lit(0), size(toks) - k),
                i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k))))))
          }
          docs.select(posexplode(g).as(Seq("__p", "__gh")))
            .groupBy(col("__gh")).agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)
        }
        def countB = {
          val g = letCol(TextStats.tokens(col("text"))) { toks =>
            when(size(toks) < k, array().cast("array<bigint>"))
              .otherwise(transform(sequence(lit(0), size(toks) - k),
                i => xxhash64((1 to k).map(j => element_at(toks, i + j)): _*)))
          }
          docs.select(posexplode(g).as(Seq("__p", "__gh")))
            .groupBy(col("__gh")).agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)
        }
        time(s"spanhash k=$k A slice+concat+hash", warmups = 2)(countA)
        time(s"spanhash k=$k B multi-arg hash", warmups = 2)(countB)
        time(s"spanhash k=$k A again (order ctl)", warmups = 0)(countA)
      }
    }

    if (which == "q51") {
      // decompose: pass 1 (bucket spans, eager collect inside
      // exactQuantiles) happens at construction; pass 2 at the action.
      println(s"[r17] q51 decomposition, sf=$sfDir")
      (1 to 2).foreach(_ =>
        noop(graft.SparkEntry.queries("q51_percentiles")(spark, sfDir)))
      (1 to 3).foreach { i =>
        resetCounters()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries("q51_percentiles")(spark, sfDir)
        val t1 = System.nanoTime()
        val j1 = jobs.get; val k1 = tasks.get
        noop(df)
        val t2 = System.nanoTime()
        println(f"[r17]   run $i: construct(pass1)=${(t1 - t0) / 1e9}%6.3f s " +
          f"(jobs=$j1 tasks=$k1)  action(pass2)=${(t2 - t1) / 1e9}%6.3f s " +
          f"(jobs=${jobs.get - j1} tasks=${tasks.get - k1})")
        import scala.jdk.CollectionConverters._
        stageLog.asScala.toSeq.sortBy(-_._4).take(6).foreach { case (id, nm, nt, ms) =>
          println(f"[r17]     stage $id%4d $nm%-60s tasks=$nt%4d ${ms}ms")
        }
      }
    }

    if (which == "aggknobs") {
      // q06/q19/q86 hash-agg kernels: Spark 4.1 codegen aggregate knobs
      // (VERDICT r16 item 8 — config-level, try at the 10x set, keep only
      // on a clear win). Runtime-settable; codegen happens per query.
      def q(n: String) = graft.SparkEntry.queries(n)(spark, sfDir)
      // order-reversed on the rerun (REVERSE=1): the candidate knob first,
      // default last, to rule out warm-order bias
      val reverse = sys.env.contains("GRAFT_KNOB_REVERSE")
      for (name <- Seq("q06_multi_agg", "q19_doc_stats", "q86_rollup_avg")) {
        def dflt(): Unit = time(s"$name default knobs", warmups = 2)(q(name))
        def cand(): Unit = {
          spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.partialOnly", "false")
          time(s"$name twolevel final too", warmups = 2)(q(name))
          spark.conf.unset("spark.sql.codegen.aggregate.map.twolevel.partialOnly")
        }
        if (reverse) { cand(); dflt() } else {
          dflt()
          spark.conf.set("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
          time(s"$name vectorized fastmap", warmups = 1)(q(name))
          spark.conf.unset("spark.sql.codegen.aggregate.map.vectorized.enable")
          cand()
        }
      }
    }

    spark.stop()
  }
}

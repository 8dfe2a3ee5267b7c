package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core
import graft.ext.TextStats

/** Round-16 optimization probes (guide §1: measure first).
  *
  * Each experiment times a candidate rewrite against the current shape on
  * the same input through the noop sink (median of 3 after 1 warm-up),
  * with a job/task listener so job-floor effects are visible.
  *
  * Usage: R16Probe [sfDir] [screens|lm|media|all]
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "all"
    val spark = core.Sessions.local(appName = "graft-r16probe")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        tasks.addAndGet(s.stageInfo.numTasks)
    })

    def time(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        jobs.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r16] $label%-40s ${ts.sorted.apply(1)}%7.3f s  " +
        f"jobs=${jobs.get}%3d tasks=${tasks.get}%5d")
    }

    def t(n: String) = core.Tables.load(spark, sfDir, n)

    if (which == "all" || which == "screens") {
      val docs = t("documents").select(col("doc_id"), col("text"))
      val q = TextStats.qualityScore(col("text"))
      val r2 = TextStats.dupNgramFraction(col("text"), 2)
      // A: current x0_pipeline shape — withColumn + filter (+ the columns
      // survive into a checkpoint-like projection)
      time("screens A withColumn+filter") {
        docs.withColumn("quality", q).withColumn("rep2", r2)
          .filter(col("quality") >= 0.3 && col("rep2") <= 0.2)
      }
      // B: filter-only — no derived columns carried
      time("screens B filter-only") {
        docs.filter(q >= 0.3 && r2 <= 0.2)
      }
      // C: single-pass fused quality+rep2 via one tokenization
      import graft.functions.ColumnOps.letCol
      def fusedKeep(text: org.apache.spark.sql.Column) = {
        letCol(TextStats.tokens(text)) { toks =>
          val n = size(toks)
          val lenScore = least(length(text).cast("double") / 400.0, lit(1.0))
          val punctScore = greatest(lit(0.0),
            lit(1.0) - regexp_count(text, lit("\\p{Punct}")).cast("double")
              / length(text) * 5.0)
          val mtl = when(n === 0, lit(0.0)).otherwise(
            length(regexp_replace(trim(text), "\\s+", "")).cast("double") / n)
          val shapeScore = when(mtl.between(2.0, 12.0), 1.0).otherwise(0.3)
          val stopScore = least(
            when(n === 0, lit(0.0)).otherwise(
              TextStats.stopwordHits(text, "en").cast("double") / n) * 4.0,
            lit(1.0))
          val quality = round(lenScore * 0.3
            + when(length(text) === 0, lit(0.2)).otherwise(punctScore * 0.2)
            + shapeScore * 0.3 + stopScore * 0.2 + lit(1e-9), 4)
          val g = when(n < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), n - 1),
              i => concat_ws(" ", slice(toks, i, lit(2)))))
          val rep2 = when(size(g) === 0, lit(0.0))
            .otherwise(lit(1.0) - size(array_distinct(g)).cast("double")
              / size(g).cast("double"))
          quality >= 0.3 && rep2 <= 0.2
        }
      }
      time("screens C fused single-tokenize") {
        docs.filter(fusedKeep(col("text")))
      }
    }

    if (which == "line") {
      val docs = t("documents").select(col("doc_id"), col("text"))
      time("line A current (row-local rebuild)") {
        graft.ext.LineDedup.dedupLines(docs, "doc_id", "text", 100L)
      }
      // B: the pre-r16 shape — anti-join per-line rows carrying text,
      // reassemble with a per-doc collect_list(struct(pos, line))
      time("line B explode+collect_list") {
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
    }

    if (which == "q51") {
      // decompose q51: pass 1 (construction-time collect) vs pass 2 (noop)
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = graft.queries.Queries.q51_percentiles(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"[r16] q51 pass1(construct+collect) ${(t1 - t0) / 1e9}%6.3f s" +
          f"  pass2(noop) ${(t2 - t1) / 1e9}%6.3f s")
      }
    }

    if (which == "lmplan") {
      // final (post-AQE) plan of selfScore: is the (w1,w2) exchange reused?
      val docs = t("documents").select(col("doc_id"), col("text"))
        .localCheckpoint(true)
      val df = graft.ext.NgramLm.selfScore(docs)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    }

    if (which == "all" || which == "lm") {
      val docs = t("documents").select(col("doc_id"), col("text"))
        .localCheckpoint(true) // stand-in for the pipeline's checkpointed `policed`
      time("lm A selfScore current") {
        graft.ext.NgramLm.selfScore(docs)
      }
      // B: ctx/vocab derived from bigramCounts instead of re-exploding
      time("lm B counts-from-counts") {
        val bi = docs.select(col("doc_id").as("__id"),
            explode(graft.ext.NgramLm.bigrams(col("text"))).as("__bg"))
          .select(col("__id"),
            col("__bg").getField("0").as("__w1"),
            col("__bg").getField("1").as("__w2"))
        val bc = bi.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c12"))
        val ctx = bc.groupBy(col("__w1")).agg(sum(col("__c12")).as("__c1"))
        val vocab = ctx.agg(count(lit(1)).as("__V"))
        val k = 0.5
        bi.join(bc, Seq("__w1", "__w2"), "left")
          .join(ctx, Seq("__w1"), "left")
          .crossJoin(broadcast(vocab))
          .withColumn("__p",
            (coalesce(col("__c12"), lit(0L)) + lit(k)) /
              (coalesce(col("__c1"), lit(0L)) + lit(k) * col("__V")))
          .groupBy(col("__id"))
          .agg(avg(-log(col("__p"))).as("__nll"), count(lit(1)).as("n_bigrams"))
          .select(col("__id").as("doc_id"), round(col("__nll"), 4).as("nll"),
            col("n_bigrams"))
      }
    }

    if (which == "span") {
      val docs = t("documents").select(col("doc_id"), col("text"))
      time("span A current") {
        graft.ext.SpanDedup.dedupSpans(docs, "doc_id", "text", k = 8)
      }
      // B: gram hashed inside the row — the gram string never leaves the
      // lambda; dup set and probe join key are the prehashed long
      import graft.functions.ColumnOps.letCol
      time("span B hash-in-row") {
        val k = 8; val minCount = 1L
        val byPos = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("__pos")
        val entries = letCol(TextStats.tokens(col("text"))) { toks =>
          when(size(toks) === 0,
            array().cast("array<struct<t:string,g:bigint>>"))
            .otherwise(transform(
              sequence(lit(0), size(toks) - 1),
              i => struct(
                element_at(toks, i + 1).as("t"),
                when(i <= size(toks) - k,
                  xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k))))).as("g"))))
        }
        val withGram = docs.select(
            col("doc_id"), posexplode(entries).as(Seq("__pos", "__e")))
          .select(col("doc_id"), col("__pos"),
            col("__e").getField("t").as("__tok"),
            col("__e").getField("g").as("__gh0"))
        val dup = withGram.filter(col("__gh0").isNotNull)
          .groupBy(col("__gh0").as("__gh"))
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") > minCount)
          .select("__gh")
        val marked = withGram
          .join(broadcast(dup), col("__gh0") === col("__gh"), "left_outer")
          .withColumn("__dupStart",
            when(col("__gh0").isNotNull && col("__gh").isNotNull, 1).otherwise(0))
        val covered = marked.withColumn("__cov",
          max(col("__dupStart")).over(byPos.rowsBetween(-(k - 1), 0)))
        covered.filter(col("__cov") === 0)
          .groupBy(col("doc_id"))
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("__pos").as("p"), col("__tok").as("t")))),
              x => x.getField("t")),
            " ").as("text"))
      }
    }

    if (which == "media2") {
      def seedOf(i: Long, g: Long): Long = if (i >= 360) 100000L else i % g
      val ids0 = t("documents")
        .filter(col("doc_id") < 450).select(col("doc_id")).as[Long]
        .repartition(math.min(450, spark.sparkContext.defaultParallelism))
      def images = ids0.map { i =>
        val data = if (i % 75 == 74) Array[Byte](9, 9, 9)
          else graft.ext.ImageDedup.encodeSmoothPng(64, 48, seedOf(i, 120))
        graft.ext.Multimodal.MediaRow(i, s"img/$i", "image/png", data)
      }
      def audio = ids0.map { i =>
        val data = if (i % 75 == 74) Array[Byte](9, 9, 9)
          else graft.ext.AudioDedup.encodeToneWav(8000, 8000, seedOf(i, 90))
        graft.ext.Multimodal.MediaRow(i, s"wav/$i", "audio/wav", data)
      }
      def videos = ids0.map { i =>
        val data = if (i % 75 == 74) Array[Byte](9, 9, 9)
          else graft.ext.VideoDedup.encodeSyntheticVideo(32, 24, 8.0, 1.5, seedOf(i, 72))
        graft.ext.Multimodal.MediaRow(i, s"vid/$i", "video/gvid", data)
      }
      time("media2 img fp+ckpt") {
        graft.ext.ImageDedup.fingerprints(images).localCheckpoint(true)
      }
      time("media2 aud fp+ckpt") {
        graft.ext.AudioDedup.fingerprints(audio).localCheckpoint(true)
      }
      time("media2 vid fp+ckpt") {
        graft.ext.VideoDedup.fingerprints(videos).localCheckpoint(true)
      }
      val imgFp = graft.ext.ImageDedup.fingerprints(images).localCheckpoint(true)
      time("media2 img pairs from ckpt") {
        graft.ext.ImageDedup.exactDupPairs(imgFp, maxChunkFreq = Some(64))
      }
      time("media2 whole row") {
        graft.queries.ExtQueries.x0_media_pipeline(spark, sfDir)
      }
    }

    if (which == "neardup") {
      val docs = graft.queries.ExtQueries
        .withPlantedDupsProvable(t("documents"))
      val exact = graft.ext.Dedup.exactByContent(docs, "text", "doc_id")
        .localCheckpoint(true)
      time("neardup A current (from ckpt input)") {
        graft.ext.Dedup.dedupNear(exact, "doc_id", "text",
          graft.ext.Dedup.MinHashParams(threshold = 1.0))
      }
    }

    if (which == "all" || which == "media") {
      val ids = t("documents")
        .filter(col("doc_id") < 450).select(col("doc_id")).as[Long]
      println(s"[r16] media ids partitions = ${ids.rdd.getNumPartitions}")
      def seedOf(i: Long, g: Long): Long = if (i >= 360) 100000L else i % g
      def videosOf(d: org.apache.spark.sql.Dataset[Long]) = d.map { i =>
        val data =
          if (i % 75 == 74) Array[Byte](9, 9, 9)
          else graft.ext.VideoDedup.encodeSyntheticVideo(32, 24, 8.0, 1.5, seedOf(i, 72))
        graft.ext.Multimodal.MediaRow(i, s"vid/$i", "video/gvid", data)
      }
      time("media video fp A current") {
        graft.ext.VideoDedup.fingerprints(videosOf(ids))
      }
      val para = spark.sparkContext.defaultParallelism
      time(s"media video fp B repartition($para)") {
        graft.ext.VideoDedup.fingerprints(videosOf(ids.repartition(para)))
      }
    }

    spark.stop()
  }
}

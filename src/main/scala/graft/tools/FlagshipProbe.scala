package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core
import graft.ext.{Dedup, TextStats}

/** Per-stage adjudication for the flagship bench rows (r12 verdict #2):
  * decompose x0_linkage's wall time (sort/blocking? JW scores? CC rounds?
  * survivorship?) and x0_pipeline's composition constant (jobs × launch
  * floor? checkpoint materializations?) the way §6.10 decomposes every
  * >2× query row.
  *
  * Method: cumulative prefixes of the composed chain, each materialized
  * through the noop sink after one warm-up; the DELTA between successive
  * prefixes is the stage's marginal cost (the same re-execution the real
  * composition pays, so deltas sum to the flagship row). A job/task
  * listener runs per prefix so launch-floor adjudications ("N jobs ×
  * ~0.15 s") are backed by counts, not guesses.
  *
  * Usage: FlagshipProbe [sfDir] [linkage|pipeline|web|media|all]
  */
object FlagshipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val which = if (args.length > 1) args(1) else "all"
    val spark = core.Sessions.local(appName = "graft-flagshipprobe")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        tasks.addAndGet(s.stageInfo.numTasks)
    })

    var prev = 0.0
    def prefix(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(100)
      jobs.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"[flagship] $label%-34s ${s}%7.2f s  (+${s - prev}%6.2f s)  " +
        f"jobs=${jobs.get}%3d tasks=${tasks.get}%5d")
      prev = s
    }

    def t(n: String) = core.Tables.load(spark, sfDir, n)

    if (which == "all" || which == "linkage") {
      println(s"== x0_linkage @ $sfDir ==")
      prev = 0.0
      import graft.functions.ColumnOps.jaroWinklerSim
      val cust = t("customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
      def planted = cust.unionByName(
        cust.filter(col("c_custkey") < 30)
          .select((col("c_custkey") + 1000000000000L).as("c_custkey"),
            concat(lit(" "), upper(col("c_name")), lit(" ")).as("c_name"),
            col("c_nationkey"),
            (col("c_acctbal") + 100).as("c_acctbal")))
      def norm = planted.withColumn("nm", lower(trim(col("c_name"))))
      def blocked = graft.ext.Blocking.sortedNeighborhood(
        norm, "c_custkey", blockKeys = Seq("c_nationkey"),
        sortKeys = Seq("nm"), window = 1, carry = Seq("nm"))
      def edges = blocked
        .filter(jaroWinklerSim(col("nm_a"), col("nm_b")) >= 0.99)
        .select(col("c_custkey_a").as("id_a"), col("c_custkey_b").as("id_b"))
      def clusters = Dedup.connectedComponents(edges)
      def labeled = norm.join(
          clusters.withColumnRenamed("id", "c_custkey"), Seq("c_custkey"), "left")
        .withColumn("cluster", coalesce(col("cluster"), col("c_custkey")))
      def golden = graft.ext.Survivorship.goldenRecord(labeled,
          keys = Seq("cluster"), orderCol = "c_custkey",
          fields = Seq("c_name", "c_acctbal"))
        .filter(col("n_versions") >= 2)
        .select(col("cluster"), col("n_versions"),
          col("c_name").as("golden_name"),
          round(col("c_acctbal") + 1e-9, 2).as("golden_acctbal"),
          col("last_order").as("last_id"))
        .orderBy(col("cluster"))
      prefix("1 norm (scan+union)")(norm)
      prefix("2 +blocking (sort+strips)")(blocked)
      prefix("3 +jw filter -> edges")(edges)
      prefix("4 +connected components")(clusters)
      prefix("5 +label join")(labeled)
      prefix("6 +survivorship+sort (=row)")(golden)
    }

    if (which == "all" || which == "pipeline") {
      println(s"== x0_pipeline @ $sfDir ==")
      prev = 0.0
      def corpus = graft.queries.ExtQueries.withPlantedDupsProvable(t("documents"))
      def exact = Dedup.exactByContent(corpus, "text", "doc_id")
      def near = Dedup.dedupNear(exact, "doc_id", "text",
        Dedup.MinHashParams(threshold = 1.0))
      // r16 shape: cleaning stages materialized between phases (the
      // line/span cleaners read their input 3x each)
      def lineClean = graft.ext.LineDedup
        .dedupLines(near.localCheckpoint(true), "doc_id", "text", 100L)
        .localCheckpoint(true)
      def spanClean = graft.ext.SpanDedup.dedupSpans(lineClean, "doc_id", "text", k = 8)
      def screened = spanClean
        .withColumn("quality", TextStats.qualityScore(col("text")))
        .withColumn("rep2", TextStats.dupNgramFraction(col("text"), 2))
        .filter(col("quality") >= 0.3 && col("rep2") <= 0.2)
      def policed = graft.ext.Blocklist.filterBlocked(screened, "text",
          Seq("forbidden content", "do not train", "opt out"))
        .localCheckpoint(true)
      // r16 shape: tile over the narrow checkpointed (doc_id, nll), then
      // join surviving ids back (ntile double-reads its input)
      def lmScored(p: DataFrame) = p
        .withColumn("n_chars", length(col("text")).cast("long"))
        .join(corpus.select(col("doc_id"), col("source")), Seq("doc_id"))
        .join(graft.ext.NgramLm.selfScore(p)
          .select(col("doc_id"), col("nll")), Seq("doc_id"))
      def rest(p: DataFrame) = {
        val nllRel = graft.ext.NgramLm.selfScore(p)
          .select(col("doc_id"), col("nll")).localCheckpoint(true)
        val lmTiles = graft.ext.Tiling
          .ntileByValue(nllRel, 10, "nll", "doc_id", "ppl_tile")
          .filter(col("ppl_tile") <= 9)
          .select(col("doc_id"))
        val lmKept = p
          .withColumn("n_chars", length(col("text")).cast("long"))
          .join(corpus.select(col("doc_id"), col("source")), Seq("doc_id"))
          .join(lmTiles, Seq("doc_id"))
        val modelKept = graft.ext.QualityModel.scoreDocs(lmKept)
          .filter(col("keep") === 1)
        val capped = graft.ext.Curation.domainCap(modelKept, n = 200)
        graft.ext.Splits.byGroup(capped, "source",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextStats.tokenCount(col("text")).cast("long")).as("n_tokens"))
          .orderBy(col("split"))
      }
      prefix("1 corpus+exact dedup")(exact)
      prefix("2 +near dedup (minhash)")(near)
      prefix("3 +line dedup")(lineClean)
      prefix("4 +span dedup")(spanClean)
      prefix("5 +quality/rep screens")(screened)
      prefix("6 +blocklist+CHECKPOINT")(policed)
      // stages below re-reference `policed` (the checkpoint); time them
      // against ONE materialized checkpoint, as the composition runs
      val p = policed
      prefix("7 +lm fit+join")(lmScored(p))
      prefix("8..11 +ntile+model+cap+split(=row-6)")(rest(p))
    }

    if (which == "all" || which == "web") {
      // r16 shape: URL-dedup FIRST (narrow shuffle), bodies fetched and
      // stripped for survivors only; `webOld` keeps the r15 shape
      // (strip everything, then dedup) for before/after tables.
      println(s"== x0_web_pipeline @ $sfDir ==")
      prev = 0.0
      val id = col("doc_id")
      val urlOf = concat(
        when(id % 2 === 0, "HTTPS").otherwise("http"), lit("://"),
        when(id % 3 === 0, "www.").otherwise(""), col("source"),
        when(id % 4 === 0, ".com").otherwise(".co.uk"),
        lit("/p/"), (id % 150).cast("string"),
        when(id % 2 === 0, "/?utm_source=x&b=2&a=1").otherwise("?a=1"))
      val htmlOf = concat(
        lit("<html><head><title>Doc "), id.cast("string"),
        lit("</title><style>p{}</style><script>if(1<2){}</script></head><body><p>"),
        col("text"),
        when(id % 3 === 0,
          lit(" \u00e2\u20ac\u2122brand\u00e2\u20ac\u2122 caf\u00c3\u00a9"))
          .otherwise(""),
        lit("</p></body></html>"))
      def keyed = t("documents").select(id, urlOf.as("url"))
        .select(id,
          graft.ext.Urls.canonicalize(col("url")).as("canon"),
          graft.ext.Urls.registeredDomainOfUrl(col("url"))
            .as("rdom"))
      def survivors = Dedup.exactByContent(keyed, "canon", "doc_id")
        .select(id, col("rdom"))
      def pages = t("documents").join(survivors, Seq("doc_id"))
        .select(id, col("rdom"), htmlOf.as("html"))
      def extracted = pages
        .withColumn("clean0", graft.ext.Html.stripTags(col("html")))
        .select(id, col("rdom"),
          graft.functions.ColumnOps.fixMojibake(col("clean0")).as("text"),
          when(length(col("html")) > 0,
            length(col("clean0")).cast("double") /
              length(col("html")).cast("double"))
            .otherwise(0.0).as("vr"))
        .localCheckpoint(true) // the production pushdown barrier
      def screened = extracted
        .withColumn("quality", TextStats.qualityScore(col("text")))
        .withColumn("n_tokens", TextStats.tokenCount(col("text")).cast("long"))
        .filter(col("vr") >= 0.05 && col("quality") >= 0.3)
        .select(id, col("rdom"), col("quality"), col("n_tokens"))
      def report = graft.ext.Curation
        .domainCap(screened, n = 100, keyCol = "rdom", idCol = "doc_id",
          rankCol = "quality")
        .groupBy(col("rdom"))
        .agg(count(lit(1)).as("n_pages"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy(col("rdom"))
      prefix("1 url keys (2-col scan)")(keyed)
      prefix("2 +url dedup (narrow window)")(survivors)
      prefix("3 +survivor fetch join+synth")(pages)
      prefix("4 +strip/moji/vr (kernel)")(extracted)
      prefix("5 +quality+tokens screen")(screened)
      prefix("6 +cap+agg+sort (=row)")(report)
      println("[flagship] whole-row check:")
      prev = 0.0
      prefix("whole")(graft.queries.ExtQueries.x0_web_pipeline(spark, sfDir))
      // the r15 shape, for the before/after delta at the same SF
      def pagesOld = t("documents").select(id, htmlOf.as("html"),
        urlOf.as("url"))
      def extractedOld = pagesOld.select(id,
        graft.ext.Urls.canonicalize(col("url")).as("canon"),
        graft.ext.Urls.registeredDomainOfUrl(col("url"))
          .as("rdom"),
        graft.functions.ColumnOps.fixMojibake(
          graft.ext.Html.stripTags(col("html"))).as("text"),
        graft.ext.Html.visibleRatio(col("html")).as("vr"))
      def reportOld = {
        val screenedOld = Dedup.exactByContent(extractedOld, "canon", "doc_id")
          .withColumn("quality", TextStats.qualityScore(col("text")))
          .filter(col("vr") >= 0.05 && col("quality") >= 0.3)
        graft.ext.Curation
          .domainCap(screenedOld, n = 100, keyCol = "rdom", idCol = "doc_id",
            rankCol = "quality")
          .groupBy(col("rdom"))
          .agg(count(lit(1)).as("n_pages"),
            sum(TextStats.tokenCount(col("text")).cast("long")).as("n_tokens"))
          .orderBy(col("rdom"))
      }
      println("[flagship] r15 shape (strip-all-then-dedup), same kernel:")
      prev = 0.0
      prefix("old whole")(reportOld)
    }
    if (which == "all" || which == "media") {
      println(s"== x0_media_pipeline @ $sfDir (whole row) ==")
      prev = 0.0
      prefix("whole")(graft.queries.ExtQueries.x0_media_pipeline(spark, sfDir))
    }
    spark.stop()
  }
}

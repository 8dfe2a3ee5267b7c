package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineSim, topCentroids}

/** X94 — incremental ANN index maintenance: the embedding-side analog of
  * X88's at-ingest media dedup index. A persisted IVF(-PQ) index is
  * created ONCE (train coarse centroids, optionally PQ codebooks, assign
  * the corpus, write the inverted lists); every later vector batch is
  * FOLDED in assign-only — nearest-centroid assignment (+ PQ encoding)
  * against the FROZEN models, appended to the persisted lists. No
  * retrain, no re-assignment of history: the production vector-store
  * ingest pattern (FAISS `add` after `train`).
  *
  * On-disk layout under `dir/`:
  *   `centroids/`  k coarse centroids ([[Ivf.save]], KB-sized)
  *   `codebooks/`  m×k PQ codebooks ([[Pq.save]]; absent = raw-vector IVF)
  *   `lists/`      parquet partitioned by (batch_id, list_id):
  *                 (id, codes|vector) — the searchable index
  *
  * Correctness contract (spec-pinned):
  *  - FOLD ≡ REBUILD: assignment and encoding are deterministic functions
  *    of the frozen models, so folding batches one at a time yields
  *    exactly the rows a one-shot assignment of the union would —
  *    [[IvfIndexSpec]] compares the multisets.
  *  - REPLAY IDEMPOTENT: a batch writes its own `batch_id=<id>`
  *    partitions with dynamic overwrite; re-folding (foreachBatch is
  *    at-least-once) replaces them with identical content.
  *  - QUERY: [[topK]] probes the query's `nprobe` nearest lists via a
  *    partition-pruned scan of `lists/` — folded rows are immediately
  *    searchable (the x94 oracle face pins a provable subcase: lossless
  *    codebooks + corpus-member queries ⇒ exact distances).
  *
  * Staleness is the FROZEN-MODEL tradeoff, watched rather than hidden:
  * [[retrainGate]] runs X93's embedding-distribution drift between a
  * reference sample (e.g. what the models trained on) and the incoming
  * batch; past the SMD threshold the fold should stop and a retrain run
  * ([[create]]) take over — assignment quality, not correctness, is what
  * degrades under drift.
  *
  * Scale shape: create = one training pass (sampleable) + one map-only
  * assignment scan; fold = map-only over the BATCH alone (history never
  * re-read, never re-encoded); query = queries (tiny) equi-joined to
  * nprobe/k of the lists. Nothing row-sized ever reaches the driver.
  */
object AnnIndex {

  /** An opened index: frozen models + the lists directory + the
    * attribute columns every list row carries (persisted at `attrs`
    * under the root so a later [[open]] — e.g. the streaming fold face —
    * writes schema-identical list files; a fold that dropped them would
    * make [[topKFiltered]] evaluate its predicate to NULL over streamed
    * rows and silently exclude them).
    *
    * Round 16: the index is PUBLISHED through an epoch-fenced pointer
    * ([[graft.streaming.CommitLog]] at `dir/_commits`): each publish —
    * [[create]] (initial build or retrain), [[compact]] — writes a
    * fresh immutable `rev=<epoch>` subtree (models + attrs + lists) and
    * commits it with a CAS, so readers NEVER observe a torn index: an
    * opened Index pins `root` (one revision's paths) for its lifetime,
    * and a crash mid-publish leaves an uncommitted subtree the pointer
    * never meets. Pre-r16 indexes (no `_commits`) resolve root = dir
    * and keep opening. */
  final case class Index(dir: String, coarse: Ivf.Model, pq: Option[Pq.Model],
      attrCols: Seq[String] = Nil, root: String = "") {
    /** The revision subtree this Index reads and folds into. */
    def resolvedRoot: String = if (root.isEmpty) dir else root
    def listsDir: String = s"$resolvedRoot/lists"
  }

  /** The currently-published revision root under `dir` (dir itself for a
    * pre-r16 unversioned index). */
  private def currentRoot(dir: String)(implicit spark: SparkSession): String =
    graft.streaming.CommitLog.current(spark, dir)
      .map(c => s"$dir/${c.version}").getOrElse(dir)

  /** Persist/load the index's attribute-column manifest. One name per
    * line; absent file = no attributes (pre-X97 indexes keep opening). */
  private def saveAttrs(dir: String, attrCols: Seq[String])
      (implicit spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/attrs")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (attrCols.isEmpty) { fs.delete(p, false); () }
    else {
      val out = fs.create(p, true)
      try out.write(attrCols.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
  }

  private def loadAttrs(dir: String)(implicit spark: SparkSession): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/attrs")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, "UTF-8").split("\n").toSeq
          .filter(_.nonEmpty)
      } finally in.close()
    }
  }

  /** Train models on the corpus and build the initial index (batch 0).
    * @param pqSubspaces Some(m) = IVF-PQ with an m-subspace codebook
    *   trained on the corpus (lossy, compact); None = raw-vector IVF.
    * @param attrCols scalar attribute columns of the corpus carried INTO
    *   the inverted lists (the Milvus/FAISS-IDSelector scalar-field
    *   pattern) so [[topKFiltered]] can push its predicate into the
    *   list-probe parquet scan instead of joining a side table. */
  def create(corpus: DataFrame, dir: String, k: Int, iters: Int = 3,
      pqSubspaces: Option[(Int, Int)] = None, seed: Long = 42,
      idCol: String = "vec_id", vecCol: String = "embedding",
      attrCols: Seq[String] = Nil)
      (implicit spark: SparkSession): Index = {
    val coarse = Ivf.train(corpus, k = k, iters = iters, seed = seed,
      vecCol = vecCol)
    val pq = pqSubspaces.map { case (m, kCodes) =>
      Pq.train(corpus, m = m, k = kCodes, iters = iters, seed = seed,
        vecCol = vecCol)
    }
    createWithModels(corpus, dir, coarse, pq, idCol, vecCol, attrCols)
  }

  /** Build the index under caller-supplied FROZEN models (e.g.
    * [[Pq.exactModel]] for the provable subcase, or models trained on a
    * sample elsewhere) and PUBLISH it atomically: the whole subtree
    * (models, attrs, corpus lists) is written into a fresh `rev=<epoch>`
    * directory first and the pointer CAS-commits LAST — a crash at any
    * earlier point leaves the previous revision live and intact (this
    * subsumes the r15 ADVICE manifest-ordering fix: a manifest can never
    * describe list files another schema produced). On an existing index
    * dir this IS the retrain-and-swap: readers holding the old Index
    * keep their pinned revision; re-[[open]] sees the new one. */
  def createWithModels(corpus: DataFrame, dir: String, coarse: Ivf.Model,
      pq: Option[Pq.Model], idCol: String = "vec_id",
      vecCol: String = "embedding", attrCols: Seq[String] = Nil)
      (implicit spark: SparkSession): Index = {
    val epoch = graft.streaming.CommitLog.current(spark, dir)
      .map(_.epoch).getOrElse(0L)
    val revName = s"rev=${epoch + 1}"
    val root = s"$dir/$revName"
    // a leftover subtree from a crashed publish at this epoch is ours to
    // clear — it was never committed
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    Ivf.save(coarse, s"$root/centroids")
    pq.foreach(m => Pq.save(m, s"$root/codebooks"))
    saveAttrs(root, attrCols)
    val idx = Index(dir, coarse, pq, attrCols, root = root)
    // the corpus is batch −1: structured-streaming batch ids start at 0,
    // so a stream folding into this index can never overwrite it
    fold(corpus, idx, batchId = -1L, idCol, vecCol)
    val won = graft.streaming.CommitLog.tryCommit(spark, dir, epoch, revName)
    require(won, s"create: concurrent index publish at $dir (epoch $epoch) " +
      "— re-read and retry")
    idx
  }

  /** Open the CURRENT revision of a persisted index (models load
    * bit-identically — the Ivf/Pq ModelStore contract). The returned
    * Index pins this revision: queries and folds against it keep using
    * its files even across a concurrent [[compact]]/retrain publish. */
  def open(dir: String)(implicit spark: SparkSession): Index = {
    val root = currentRoot(dir)
    val pqPath = new org.apache.hadoop.fs.Path(s"$root/codebooks")
    val hasPq = pqPath.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(pqPath)
    Index(dir, Ivf.load(s"$root/centroids"),
      if (hasPq) Some(Pq.load(s"$root/codebooks")) else None,
      loadAttrs(root), root = root)
  }

  /** Fold one batch into the index: assign-only against the frozen
    * models, one map-only pass over the BATCH. The batch's OWN partition
    * subtree (`batch_id=<id>`) is dropped before the write — dynamic
    * overwrite alone would only replace the leaf (batch, list) partitions
    * the new content touches, leaving orphan lists behind on a
    * superseding re-fold — so replays are idempotent and a corrected
    * re-fold replaces the batch wholesale while every other batch's
    * files stay untouched.
    *
    * Concurrency contract: folds of DIFFERENT batch ids may run
    * concurrently — they own disjoint `batch_id=<id>` subtrees, so
    * there is nothing to fence (unlike [[graft.streaming.StreamingUpsert]]'s
    * whole-snapshot rewrite, which needs its CommitLog CAS). Two
    * concurrent folds of the SAME batch id are caller error (the
    * delete+write of one subtree is not atomic): the streaming face
    * guarantees uniqueness via its checkpoint; batch callers must
    * partition the id space per writer. */
  def fold(batch: DataFrame, index: Index, batchId: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    // the index's attribute manifest is the lists schema contract: a
    // batch missing a declared attribute column must fail HERE, not as
    // NULL-evaluated predicates at the first filtered search
    val missing = index.attrCols.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"fold: batch is missing index attribute column(s) ${missing.mkString(", ")} " +
        s"declared at index creation (attrCols=${index.attrCols.mkString(", ")})")
    val sub = new org.apache.hadoop.fs.Path(
      s"${index.listsDir}/batch_id=$batchId")
    sub.getFileSystem(spark.sessionState.newHadoopConf()).delete(sub, true)
    val assigned = Ivf.assign(batch, index.coarse, vecCol)
    val attrs = index.attrCols.map(c => col(s"`$c`"))
    val rows = index.pq match {
      case Some(m) => assigned.select(col(idCol).as("id") +: col("list_id") +:
        Pq.encode(col(vecCol), m).as("codes") +: attrs: _*)
      case None => assigned.select(col(idCol).as("id") +: col("list_id") +:
        col(vecCol).as("vector") +: attrs: _*)
    }
    rows.withColumn("batch_id", lit(batchId))
      .write.mode("append")
      .partitionBy("batch_id", "list_id")
      .parquet(index.listsDir)
  }

  /** The persisted inverted lists (id, list_id, codes|vector, batch_id). */
  def lists(index: Index)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(index.listsDir)

  /** Top-k per query over the persisted index: the query batch explodes
    * to its `nprobe` nearest lists and equi-joins the (partition-pruned)
    * lists scan. IVF-PQ indexes score by ADC over the stored codes
    * (squared L2 ascending, ties by id); raw IVF scores exact cosine
    * (descending, ties by id) — each matching its batch-mode sibling
    * ([[Pq.ivfPqTopK]] / [[Ivf.topK]]) so index and ad-hoc paths can
    * never rank differently. */
  def topK(index: Index, queries: DataFrame, k: Int, nprobe: Int = 4,
      qidCol: String = "query_id", vecCol: String = "embedding")
      (implicit spark: SparkSession): DataFrame =
    rankTopK(index,
      scoreProbed(lists(index), index, queries, lit(nprobe), qidCol, vecCol),
      k)

  /** Per-query candidate scores over `listsDf` at probe depth `npCol`
    * (an int column evaluated against the QUERY row — a literal for the
    * uniform-depth [[topK]], the per-query widened depth for
    * [[topKFiltered]]). IVF-PQ scores ADC over stored codes; raw IVF
    * scores exact cosine. */
  private def scoreProbed(listsDf: DataFrame, index: Index,
      queries: DataFrame, npCol: Column, qidCol: String,
      vecCol: String): DataFrame = {
    val probes = explode(topCentroids(col(vecCol), index.coarse.lit, npCol))
      .as("list_id")
    index.pq match {
      case Some(m) =>
        val q = queries.select(col(qidCol).as("query_id"),
          Pq.luts(col(vecCol), m).as("luts"), probes)
        listsDf.join(q, "list_id")
          .select(col("query_id"), col("id"),
            Pq.adc(col("codes"), col("luts")).as("dist"))
      case None =>
        val q = queries.select(col(qidCol).as("query_id"),
          col(vecCol).as("qvec"), probes)
        listsDf.join(q, "list_id")
          .select(col("query_id"), col("id"),
            cosineSim(col("vector"), col("qvec")).as("score"))
    }
  }

  /** Rank scored candidates to top-k per query — squared-L2 ascending
    * for ADC, cosine descending for raw vectors, ties by id; matches the
    * batch-mode siblings ([[Pq.ivfPqTopK]] / [[Ivf.topK]]) so index and
    * ad-hoc paths can never rank differently. */
  private def rankTopK(index: Index, scored: DataFrame, k: Int): DataFrame = {
    val w = index.pq match {
      case Some(_) => Window.partitionBy(col("query_id"))
        .orderBy(col("dist"), col("id"))
      case None => Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("id"))
    }
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** FILTERED top-k per query: the FAISS-IDSelector / Milvus
    * filtered-search contract — return the k nearest index entries that
    * SATISFY an attribute predicate, not the survivors of a fixed-size
    * unfiltered shortlist (post-filtering silently under-delivers k as
    * the filter gets selective: a 1%-selectivity predicate leaves
    * ~k/100 of a fixed shortlist). The index must have been built with
    * the predicate's columns in `attrCols`, so the predicate lands IN
    * the list-probe parquet scan (PushedFilters on the lists read —
    * plan-pinned) rather than as a join against a side table.
    *
    * Probe-depth discipline: each query's depth is the EXACT MINIMAL
    * one — the smallest d such that its d nearest lists hold ≥ k
    * eligible candidates (or nLists when no depth suffices; then the
    * result is EXACT over the eligible set, fewer than k rows only when
    * fewer eligible items exist), floored at `nprobe0` (the caller's
    * quality knob, FAISS-nprobe style). Computed in ONE logical plan,
    * nothing collected: the filtered lists aggregate to per-list
    * eligible COUNTS (row-level predicate ⇒ list-level counts are all
    * the widening needs — candidates ARE the eligible rows of probed
    * lists), each query explodes its full centroid ranking once
    * (nLists tiny ints), a running sum over that ranking finds the
    * minimal depth, and the final pass scores each query at its own
    * depth via a per-row probe count. Replaces the round-13-verdict
    * doubling loop — log2(nLists) count-join rounds with a driver
    * collect each — measured 2× a full-depth pass at the 1000× set
    * (`tools/FannProbe`); the counting side is now one partial-agg
    * scan.
    *
    * Approximation contract (same as [[topK]]): with k eligible
    * candidates in reach at depth d < nLists, closer eligible items may
    * exist in unprobed lists — recall, not membership, is what depth
    * buys. Exactness at full depth is what the x97 oracle face pins.
    *
    * @param queries unique `qidCol` per row (per-query depth is keyed
    *   on it) */
  def topKFiltered(index: Index, queries: DataFrame, predicate: Column,
      k: Int, nprobe0: Int = 4, qidCol: String = "query_id",
      vecCol: String = "embedding")
      (implicit spark: SparkSession): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe0 >= 1, s"nprobe0 must be >= 1, got $nprobe0")
    val nLists = index.coarse.k
    val fl = lists(index).filter(predicate)
    val qs = queries.select(col(qidCol).as("query_id"), col(s"`$vecCol`"))

    // per-list eligible counts: one partial-aggregated pass over the
    // predicate-pushed lists scan, ≤ nLists output rows
    val perList = fl.groupBy(col("list_id")).agg(count(lit(1)).as("__c"))
    // each query's full centroid ranking (nLists ints, row-local), its
    // running eligible count, and the minimal sufficient depth
    val ranked = qs.select(col("query_id"),
      posexplode(topCentroids(col(s"`$vecCol`"), index.coarse.lit,
        lit(nLists))).as(Seq("__rk", "list_id")))
    val wcum = Window.partitionBy(col("query_id")).orderBy(col("__rk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val depth = ranked
      .join(broadcast(perList), Seq("list_id"), "left")
      .withColumn("__cum", sum(coalesce(col("__c"), lit(0L))).over(wcum))
      .groupBy(col("query_id"))
      .agg(coalesce(min(when(col("__cum") >= k, col("__rk") + 1)),
        lit(nLists)).cast("int").as("__d"))
      .select(col("query_id"),
        greatest(col("__d"), lit(math.min(nprobe0, nLists))).as("__np"))
    val qWithNp = qs.join(broadcast(depth), Seq("query_id"))
    rankTopK(index,
      scoreProbed(fl, index, qWithNp, col("__np"), "query_id", vecCol), k)
  }

  /** ADC-shortlist + exact-re-rank search over a persisted IVF-PQ index —
    * the production refine pattern ([[Pq.refineTopK]]'s shape applied to
    * the index): the index supplies an ADC shortlist from its stored
    * CODES alone (partition-pruned probe of nprobe lists), then only the
    * shortlist ids fetch their raw vectors from `vectors` — the caller's
    * primary store (the source table the corpus and every folded batch
    * came from; the index itself never stores floats) — for exact
    * squared-L2 re-ranking. At 100 TB the exact math touches
    * shortlist/|corpus| of the raw floats; the rank/tie contract matches
    * [[Pq.refineTopK]] so index and ad-hoc refined paths agree. Closes
    * the raw-ADC quality gap (measured on the sf0.01 corpus, AnnIndexSpec:
    * recall@10 0.31 raw ADC → 0.73 refined at shortlist 100, nprobe 8/16;
    * unprobed lists bound what refine can recover — raise nprobe, not
    * shortlist, when recall stalls). */
  def topKRefined(index: Index, queries: DataFrame, vectors: DataFrame,
      k: Int, shortlist: Int = 100, nprobe: Int = 4,
      qidCol: String = "query_id", idCol: String = "vec_id",
      vecCol: String = "embedding")(implicit spark: SparkSession): DataFrame = {
    require(index.pq.nonEmpty, "topKRefined refines ADC ranks — IVF-PQ only")
    require(shortlist >= k, s"shortlist $shortlist < k=$k")
    val cand = topK(index, queries, k = shortlist, nprobe, qidCol, vecCol)
      .select(col("query_id"), col("id"))
    // LEFT join + in-plan guard: a shortlist id missing from the caller's
    // primary store (stale/partial `vectors`) must FAIL the query, not
    // silently shrink the result — an inner join here would drop the row
    // and hand back a plausible-looking top-k over whatever survived.
    val withVec = cand.join(
      vectors.select(col(idCol).as("id"), col(vecCol).as("cvec")), Seq("id"),
      "left")
    val q = queries.select(col(qidCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = withVec.join(broadcast(q), "query_id")
      .select(col("query_id"), col("id"),
        when(col("cvec").isNotNull, Pq.l2sq(col("cvec"), col("qvec")))
          .otherwise(raise_error(concat(
            lit("topKRefined: shortlist id missing from vectors "),
            lit("(stale or partial primary store): id="),
            col("id").cast("string"))))
          .as("dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** FILTERED + REFINED search — the production IVF-PQ query path with
    * an attribute predicate: [[topKFiltered]] supplies an ADC shortlist
    * of ELIGIBLE candidates (predicate pushed into the list-probe scan,
    * probe depth widened until the shortlist is full), then only the
    * shortlist ids fetch raw vectors from the caller's primary store for
    * exact squared-L2 re-ranking ([[topKRefined]]'s contract — LEFT join
    * + in-plan raise_error guard on a stale/partial store, identical
    * rank/tie rules). Because the shortlist is filtered BEFORE the k cut,
    * a selective predicate cannot starve the result the way post-filter
    * refine does; because widening targets `shortlist` (not k), refine
    * has eligible headroom to fix ADC rank inversions. */
  def topKRefinedFiltered(index: Index, queries: DataFrame,
      vectors: DataFrame, predicate: Column, k: Int, shortlist: Int = 100,
      nprobe0: Int = 4, qidCol: String = "query_id",
      idCol: String = "vec_id", vecCol: String = "embedding")
      (implicit spark: SparkSession): DataFrame = {
    require(index.pq.nonEmpty,
      "topKRefinedFiltered refines ADC ranks — IVF-PQ only")
    require(shortlist >= k, s"shortlist $shortlist < k=$k")
    val cand = topKFiltered(index, queries, predicate, k = shortlist,
        nprobe0, qidCol, vecCol)
      .select(col("query_id"), col("id"))
    val withVec = cand.join(
      vectors.select(col(s"`$idCol`").as("id"), col(s"`$vecCol`").as("cvec")),
      Seq("id"), "left")
    val q = queries.select(col(s"`$qidCol`").as("query_id"),
      col(s"`$vecCol`").as("qvec"))
    val scored = withVec.join(broadcast(q), "query_id")
      .select(col("query_id"), col("id"),
        when(col("cvec").isNotNull, Pq.l2sq(col("cvec"), col("qvec")))
          .otherwise(raise_error(concat(
            lit("topKRefinedFiltered: shortlist id missing from vectors "),
            lit("(stale or partial primary store): id="),
            col("id").cast("string"))))
          .as("dist"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** List-file compaction — X86 for the index. Every [[fold]] writes its
    * own `(batch_id, list_id)` parquet subtree, so a fold-heavy index
    * accumulates one small file per list PER MICRO-BATCH; after
    * thousands of batches every [[topK]] probe opens thousands of tiny
    * files (the r15 verdict's #1 engine-native gap). Compaction rewrites
    * history into ONE `batch_id = -1` subtree per list (merged with the
    * create-time corpus batch, whose id is −1 already) inside a fresh
    * revision, and publishes it with the same CAS the other publishes
    * use — readers pinned to the old revision stay consistent, nothing
    * is deleted (run [[vacuumRevisions]] once old readers drain).
    *
    * REPLAY SAFETY: the NEWEST stream batch keeps its own `batch_id`
    * subtree, copied verbatim. foreachBatch is at-least-once, and the
    * one batch a restarted stream may replay is the last one — its
    * re-fold deletes and rewrites that subtree idempotently. Compacting
    * it into −1 instead would turn that replay into silent duplication.
    * Earlier batches are durable in the sink's commit log and never
    * replay (the [[graft.streaming.StreamingAnnIndex]] contract).
    *
    * Concurrency: folds running DURING compact write to the old
    * revision and are lost at the swap — compaction is a maintenance
    * window (stop the stream), same as retraining. The CAS still
    * guards against a concurrent create/compact racing the pointer.
    *
    * @return the new Index and (filesBefore, filesAfter); require()-
    *   gated to never publish MORE files than it found. */
  def compact(dir: String)(implicit spark: SparkSession): (Index, (Long, Long)) = {
    val cur = open(dir)
    val epoch = graft.streaming.CommitLog.current(spark, dir)
      .map(_.epoch).getOrElse(0L)
    val revName = s"rev=${epoch + 1}"
    val root = s"$dir/$revName"
    val rp = new org.apache.hadoop.fs.Path(root)
    rp.getFileSystem(spark.sessionState.newHadoopConf()).delete(rp, true)
    // models + attrs travel bit-identically (the ModelStore contract)
    Ivf.save(cur.coarse, s"$root/centroids")
    cur.pq.foreach(m => Pq.save(m, s"$root/codebooks"))
    saveAttrs(root, cur.attrCols)
    // partition-column inference reads small batch_id values back as
    // INT — normalize to the long the fold wrote
    val rows = lists(cur).withColumn("batch_id", col("batch_id").cast("long"))
    // newest STREAM batch (ids >= 0) stays replayable under its own id
    val newest = rows.agg(max(when(col("batch_id") >= 0, col("batch_id"))))
      .collect().head
    val keepId = if (newest.isNullAt(0)) None else Some(newest.getLong(0))
    val compacted = keepId match {
      case Some(b) => rows.withColumn("batch_id",
        when(col("batch_id") === b, col("batch_id")).otherwise(lit(-1L)))
      case None => rows.withColumn("batch_id", lit(-1L))
    }
    // one writer task per list -> one file per (batch_id, list_id) leaf
    compacted.repartition(col("list_id"))
      .write.mode("append").partitionBy("batch_id", "list_id")
      .parquet(s"$root/lists")
    val (before, _) = graft.sources.Compact.dirStats(spark, cur.listsDir)
    val (after, _) = graft.sources.Compact.dirStats(spark, s"$root/lists")
    require(after <= before,
      s"compact: produced MORE files ($after) than it found ($before) — " +
        "refusing to publish (index already compact?)")
    val won = graft.streaming.CommitLog.tryCommit(spark, dir, epoch, revName)
    require(won, s"compact: concurrent index publish at $dir (epoch $epoch)")
    (open(dir), (before, after))
  }

  /** Retrain-and-swap for a drifted index — what [[retrainGate]] points
    * at: fresh models trained on `corpus` (the caller's primary vector
    * store, or a sample of it), the whole corpus re-encoded under them,
    * published atomically through the revision CAS. Readers holding the
    * old Index finish their queries on the old revision; the next
    * [[open]] (e.g. the streaming fold's per-batch open) sees the new
    * models. The previous revision's attribute manifest carries over so
    * filtered search keeps working across the swap. */
  def retrainAndSwap(corpus: DataFrame, dir: String, k: Int, iters: Int = 3,
      pqSubspaces: Option[(Int, Int)] = None, seed: Long = 42,
      idCol: String = "vec_id", vecCol: String = "embedding")
      (implicit spark: SparkSession): Index = {
    val prev = open(dir)
    create(corpus, dir, k, iters, pqSubspaces, seed, idCol, vecCol,
      prev.attrCols)
  }

  /** Delete every non-current `rev=<n>` subtree (and, once the index is
    * versioned, the legacy unversioned `centroids`/`codebooks`/`lists`/
    * `attrs` files a pre-r16 layout left at the top level). Run only
    * after in-flight readers of old revisions have drained — an Index
    * pins its revision's files. */
  def vacuumRevisions(dir: String)(implicit spark: SparkSession): Unit = {
    graft.streaming.CommitLog.current(spark, dir).foreach { c =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(p).foreach { s =>
        val n = s.getPath.getName
        val stale = (n.matches("rev=\\d+") && n != c.version) ||
          n == "centroids" || n == "codebooks" || n == "lists" || n == "attrs"
        if (stale) fs.delete(s.getPath, true)
      }
    }
  }

  /** X93 drift gate for the frozen models: standardized mean difference
    * per dimension between `ref` (what the models represent — e.g. the
    * training sample) and the incoming batch. Returns (drift report,
    * retrain recommended). Fold correctness never depends on this —
    * assignment QUALITY does, which is exactly what a silent drift
    * degrades. */
  def retrainGate(ref: DataFrame, batch: DataFrame, maxSmd: Double = 0.5,
      vecCol: String = "embedding"): (DataFrame, Boolean) = {
    val report = Drift.embeddingDrift(ref, batch, vecCol)
    val worst = report.agg(max(col("smd"))).collect().head
    (report, !worst.isNullAt(0) && worst.getDouble(0) > maxSmd)
  }
}

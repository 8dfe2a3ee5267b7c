package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X1/X2 — deduplication operators for training-data pipelines (SURVEY §2.8).
  *
  * Scale design notes (100 TB):
  *  - exact dedup shuffles a 64-bit content hash + length, never the text;
  *  - MinHash/LSH shuffles `bands` small rows per document (band key + id),
  *    never a crossJoin: candidate pairs only form inside equal LSH buckets;
  *  - Jaccard verification re-joins shingle sets only for candidate ids
  *    (semi-join pruned scan);
  *  - cluster merge is iterative min-label propagation over the pair graph,
  *    converging in O(log diameter) Spark jobs — near-dup graphs are
  *    overwhelmingly tiny cliques, so 5-10 iterations suffice and each is a
  *    shuffle of (id, label) pairs only.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on explicit columns (X1): `dropDuplicates` — hash shuffle
    * on the named columns, first-seen row wins per group. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact content dedup with a deterministic winner: keeps the row with the
    * minimum `idCol` per identical `textCol`. Shuffles (hash64, length)
    * instead of the full text — at 100 TB the text column never moves. */
  def exactByContent(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val key = Seq(xxhash64(col(textCol)), length(col(textCol)))
    val w = Window.partitionBy(key: _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate-group summary (the oracle-checkable face of X1): one row per
    * distinct content with the surviving id and the copy count. */
  def duplicateGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** X72 — dedup savings report: the numbers every dedup run publishes —
    * per duplicate-cluster SIZE, how many clusters exist, how many rows
    * the pass removes (size − 1 per cluster) and how many bytes those
    * removals free. Shuffles (xxhash64, length) per row — the X1 wire
    * discipline: text never leaves the scan — then aggregates the
    * cluster relation (one row per distinct text) into the ≤ max-size
    * report. A `n_copies = 1` row reports the untouched singletons, so
    * the report also totals the corpus. */
  def savingsReport(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(xxhash64(col(textCol)).as("__h"),
        length(col(textCol)).cast("long").as("__len"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("n_copies"), max(col("__len")).as("__len"))
      .groupBy(col("n_copies"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("__len")).as("__lenSum"))
      .withColumn("rows_removed", col("n_clusters") * (col("n_copies") - 1))
      .withColumn("bytes_saved", col("__lenSum") * (col("n_copies") - 1))
      .drop("__lenSum")

  // ------------------------------------------------------------- MinHash

  /** @param numPerm     signature length (hash permutations)
    * @param bands       LSH bands; rows-per-band = numPerm / bands. The
    *                    candidate s-curve midpoint is ≈ (1/bands)^(bands/numPerm);
    *                    the default (64, 8) sits at ≈ 0.77 — aligned with the
    *                    0.7 verification threshold so low-Jaccard pairs rarely
    *                    reach the (expensive) exact-verify join. Measured: on
    *                    a shared-vocabulary 50k-doc corpus, (64, 16) (midpoint
    *                    ≈ 0.5) produced ~100× more false candidates and 4×
    *                    the wall-clock.
    * @param shingleSize word n-gram size
    * @param threshold   verified-Jaccard cutoff for a pair to count as dup */
  final case class MinHashParams(
      numPerm: Int = 64,
      bands: Int = 8,
      shingleSize: Int = 3,
      threshold: Double = 0.7) {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    def rowsPerBand: Int = numPerm / bands
  }

  import graft.functions.ColumnOps.letCol

  /** Distinct word n-gram shingles of a text column. Empty/short texts get
    * one whole-text shingle so they can still collide exactly.
    * letCol-bound so tokenization happens once per row, not once per
    * shingle window (see [[graft.functions.ColumnOps.letCol]]). */
  def shingles(text: Column, n: Int): Column =
    letCol(TextStats.tokens(text)) { toks =>
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
    }

  /** MinHash signature of a string-shingle array: each shingle is
    * string-hashed ONCE (builtin xxhash64), then the per-permutation
    * min-loop runs inside the native codegen'd
    * [[graft.functions.MinHashSignature]] kernel — the O(numPerm·|shingles|)
    * inner loop never touches interpreted higher-order-function evaluation.
    * (The pipeline in [[candidatePairs]]/[[nearDupPairs]] skips the string
    * stage entirely and feeds the kernel pre-hashed sets.) */
  def minhashSignature(shingleArr: Column, numPerm: Int): Column =
    graft.functions.HashFunctions.minhashSignature(
      transform(shingleArr, s => xxhash64(s)), numPerm)

  /** LSH band keys: hash of each signature slice. Output: array of `bands`
    * longs; equal element b ⇒ candidate pair in band b. letCol-bound: the
    * signature is computed once, not once per band. */
  def bandKeys(signature: Column, p: MinHashParams): Column =
    letCol(signature) { sig =>
      transform(
        sequence(lit(0), lit(p.bands - 1)),
        b => xxhash64(b, concat_ws(",", slice(sig, b * p.rowsPerBand + 1, lit(p.rowsPerBand)))))
    }

  /** (id, sorted shingle-hash array, band-key array) — the sketch table
    * every downstream stage (banding self-join, Jaccard verify) reads.
    * Shingle strings are hashed to sorted 64-bit sets immediately:
    * signatures come from the same hashes, and the verify stage compares
    * hash-sets with the merge-based [[graft.functions.JaccardSorted]]
    * kernel — the text never leaves the first projection. At 100 TB this is
    * the materialization you want anyway: sketches are ~1% of the text size
    * and are consumed multiple times.
    *
    * Lazy and UNPERSISTED: callers composing [[candidatePairsFromSketch]] /
    * [[nearDupPairsFromSketch]] own the cache lifecycle. The convenience
    * entry points ([[candidatePairs]], [[nearDupPairs]]) cache it, force the
    * (small) pair result, and unpersist — nothing outlives the call. */
  def sketch(df: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams()): DataFrame =
    df.select(
        col(idCol).as("id"),
        array_sort(transform(
          shingles(col(textCol), p.shingleSize), s => xxhash64(s))).as("shh"))
      .withColumn("bk", bandKeys(
        graft.functions.HashFunctions.minhashSignature(col("shh"), p.numPerm), p))

  /** Candidate pairs (idA < idB) that share at least one LSH band bucket.
    * EAGER: executes the LSH pipeline at call time and returns the (small)
    * pair set checkpoint-backed, so the sketch cache can be released before
    * returning. Callers that need a lazy plan (staged execution, plan
    * inspection) compose [[sketch]] + [[candidatePairsFromSketch]] and own
    * the cache lifecycle. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams()): DataFrame =
    withCachedSketch(df, idCol, textCol, p)(candidatePairsFromSketch)

  def candidatePairsFromSketch(sketch: DataFrame): DataFrame = {
    val exploded = sketch
      .select(col("id"), posexplode(col("bk")).as(Seq("band", "key")))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Near-dup pairs with exact Jaccard verification over shingle-hash sets:
    * candidates from LSH banding, then joins back to the cached sketch
    * table and a single merge pass per pair
    * ([[graft.functions.JaccardSorted]]). Identical results to string-set
    * Jaccard up to 64-bit hash collisions (~2^-64 per shingle pair).
    * EAGER — see [[candidatePairs]]; lazy variant:
    * [[nearDupPairsFromSketch]]. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams()): DataFrame =
    withCachedSketch(df, idCol, textCol, p)(nearDupPairsFromSketch(_, p))

  def nearDupPairsFromSketch(sketch: DataFrame,
      p: MinHashParams = MinHashParams()): DataFrame = {
    val sh = sketch.select(col("id"), col("shh"))
    candidatePairsFromSketch(sketch)
      .join(sh.toDF("id_a", "sh_a"), "id_a")
      .join(sh.toDF("id_b", "sh_b"), "id_b")
      .withColumn("jaccard",
        graft.functions.HashFunctions.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= p.threshold)
      // +1e-9 before ROUND (the q44 guard): Jaccard is an exact rational
      // |∩|/|∪| that can land ON a .xxxx5 boundary, where engines'
      // rounding modes disagree
      .select(col("id_a"), col("id_b"),
        round(col("jaccard") + lit(1e-9), 4).as("jaccard"))
  }

  /** Cache the sketch for the duration of `f`'s plan, force the (small) pair
    * result into a lineage-truncated local checkpoint, then unpersist the
    * sketch. The checkpointed pair blocks are reference-tracked by the
    * ContextCleaner and reclaimed on GC — unlike `.cache()`, which pins
    * blocks in the CacheManager for the session lifetime. */
  private def withCachedSketch(df: DataFrame, idCol: String, textCol: String,
      p: MinHashParams)(f: DataFrame => DataFrame): DataFrame =
    withCachedSketchCounted(df, idCol, textCol, p)(f)._1

  /** [[withCachedSketch]] plus the checkpointed relation's row count,
    * observed ON the checkpoint materialization job itself (the CC-loop
    * convergence trick) — r17, so [[dedupNear]] hands connectedComponents
    * its knownEdges without a second action over the blocks. */
  private def withCachedSketchCounted(df: DataFrame, idCol: String,
      textCol: String, p: MinHashParams)(
      f: DataFrame => DataFrame): (DataFrame, Long) = {
    val sk = sketch(df, idCol, textCol, p).cache()
    try {
      val obs = org.apache.spark.sql.Observation()
      val ck = f(sk).observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
      (ck, obs.get("n").asInstanceOf[Long])
    } finally sk.unpersist(false)
  }

  // ------------------------------------------------- cluster merge / dedup

  /** Default driver union-find edge budget, derived from THIS JVM's heap
    * (rounds ≤15 hard-coded 16 M, which silently encoded a 4–8 GB
    * driver). Per-edge driver cost, from the packed representation:
    * 16 B transport in (one interleaved long[] per partition) + the
    * [[LongLongMap]] parent table at 17 B/slot, ≤ 3 slots per distinct
    * id at the 2/3-load power-of-2 growth policy, + 16 B/id labels out.
    * At the dedup-graph design shape V ≈ E (clusters have ≥ |cluster|−1
    * edges, LSH emits several edges per pair) that is ≈ 16 + 51 + 16 ≈
    * 85 B/edge — call it 100 with allocator margin. Budgeting a QUARTER
    * of `Runtime.maxMemory` against 100 B/edge leaves 4× headroom, which
    * covers the V = 2E worst case (all edges disjoint, ≈ 150 B/edge)
    * inside half the heap: an 8 GB driver derives ~21 M edges, 4 GB
    * ~10 M, 32 GB ~80 M. Floored at 1 M (any JVM can union-find 1 M
    * edges), capped at 256 M (≥ 25 GB of primitive arrays — past that
    * driver GC pauses rival the distributed loop's round cost). An
    * explicit `driverEdgeLimit` argument always wins. */
  val defaultDriverEdgeLimit: Long =
    driverEdgeLimitFor(Runtime.getRuntime.maxMemory)

  /** The derivation above, factored for the spec to pin. */
  private[ext] def driverEdgeLimitFor(maxHeapBytes: Long): Long =
    math.min(256000000L, math.max(1000000L, maxHeapBytes / 4 / 100))

  /** Connected components over an (id_a, id_b) pair graph. Returns
    * (id, cluster) where cluster is the min id reachable.
    *
    * Near-dup edge sets are tiny relative to the corpus (pairs above a
    * 0.7 Jaccard threshold: a 10 B-doc corpus at a 1% dup rate is ~100 M
    * edges — GBs, not TBs), so below `driverEdgeLimit` edges we collect
    * and run union-find on the driver: ONE job end to end instead of ~6
    * label-table shuffles per propagation round, and union-find is
    * O(α(n)) per edge where every distributed round pays the full stage
    * ladder. Transport is PACKED — each partition ships one primitive
    * long[] (16 B/edge, no Row/tuple boxing) and labels return as
    * packed chunks through parallelize; the per-heap budget math lives
    * at [[defaultDriverEdgeLimit]] (round 15 measured the 14.85 M-edge
    * 1000×-set x0_linkage edge set resolving in seconds here vs
    * ~2.5 s/round × 5 rounds distributed). Beyond the limit, the
    * distributed min-label propagation loop takes over (O(log diameter)
    * rounds, shuffling only (id, label)).
    *
    * @param knownEdges the edge count when the CALLER already knows the
    *   scale (e.g. it just materialized the pair table): skips the probe
    *   `cache()+count()`, which at 100 TB can evict hotter blocks than
    *   it saves. The driver path then collects in a single uncached
    *   pass; the distributed path still caches for its own loop. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
      driverEdgeLimit: Long = defaultDriverEdgeLimit,
      knownEdges: Option[Long] = None): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("id_a"), col("id_b"))
    // regime probe: cache+count only when the caller didn't supply the
    // scale — the count itself is cheap at any size, but an unconditional
    // cache() materializes the full edge relation and can evict hotter
    // blocks on a busy cluster (r15 verdict)
    val (probed, nEdges, probeCached) = knownEdges match {
      case Some(n) => (edges, n, false)
      case None =>
        val c = edges.cache()
        (c, c.count(), true)
    }
    if (nEdges <= driverEdgeLimit) {
      // packed collect: one long[] per partition, ids interleaved —
      // a single pass, so no cache is needed on the knownEdges path
      val packed = probed.rdd.mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r => b += r.getLong(0); b += r.getLong(1) }
        Iterator.single(b.result())
      }.collect()
      if (probeCached) probed.unpersist()
      val labels = unionFindPacked(packed)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.LongType, nullable = false)))
      // one partition per ~1M labels, capped at defaultParallelism: the
      // collect side produced one chunk per SOURCE partition, and a
      // 10 000-partition source must not become 10 000 tiny
      // driver-seeded partitions (r15 verdict)
      val nParts = math.max(1, math.min(labels.length,
        spark.sparkContext.defaultParallelism))
      val rows = spark.sparkContext
        .parallelize(labels.toSeq, nParts)
        .mapPartitions(_.flatMap { a =>
          Iterator.range(0, a.length, 2)
            .map(i => org.apache.spark.sql.Row(a(i), a(i + 1)))
        })
      return spark.createDataFrame(rows, schema)
    }
    // the propagation loop re-reads the edge relation every round, so it
    // is cached here even when the regime probe was skipped
    val cachedPairs = if (probeCached) probed else edges.cache()
    // Loop tuning (round 13, FlagshipProbe: CC was 30 of x0_linkage's
    // 35 s at the 100× set, and nearly all of it was per-round Spark
    // constants, not data):
    //  - AQE off for the propagation loop: each round is a fixed
    //    ~6-shuffle plan over |V|-row label tables, and AQE turns every
    //    exchange into its own job + stats barrier (measured 103 → 19
    //    jobs at the 100× set). The loop's shapes are uniform by
    //    construction ((id, label) pairs, hash joins on longs), so
    //    runtime re-planning has nothing to win.
    //  - shuffle partitions sized from the measured edge count (~500k
    //    16-byte rows per partition, floor 8 — so the term only bites
    //    past 4M edges; below that the floor IS the sizing, which is the
    //    measured intent for the 1–4M band), instead of the session's
    //    scan-oriented default: a 32-way shuffle of a 1.5M-row label
    //    table is ~500 tasks/round of pure task-launch constant. On a
    //    real cluster with billions of edges the cap keeps the session
    //    default and this clause is inert.
    // Both restored after; conf reads are per-query at planning time.
    val aqeKey = "spark.sql.adaptive.enabled"
    val shufKey = "spark.sql.shuffle.partitions"
    val aqeOld = spark.conf.get(aqeKey)
    val shufOld = spark.conf.get(shufKey)
    val loopP = math.max(8L, math.min(shufOld.toLong, nEdges / 500000L))
    spark.conf.set(aqeKey, "false")
    spark.conf.set(shufKey, loopP.toString)
    try distributedComponents(cachedPairs, maxIter)
    finally {
      spark.conf.set(aqeKey, aqeOld)
      spark.conf.set(shufKey, shufOld)
      cachedPairs.unpersist(false)
    }
  }

  /** Primitive open-addressed long→long table for the driver union-find:
    * Scala's LongMap specializes KEYS only (values live in an AnyRef
    * array), so a 30 M-node parent map would box every link. Two long
    * arrays, linear probing, power-of-2 capacity, grow at 2/3 load —
    * 16 B/slot, exactly the budget [[connectedComponents]]' scaladoc
    * states. Zero is a legal key (occupancy is a separate bitset-free
    * sentinel array would cost reads; we keep a boolean array — 1 B/slot
    * on top, still inside budget). */
  private final class LongLongMap(initialCapacity: Int) {
    private var cap = java.lang.Integer.highestOneBit(
      math.max(64, initialCapacity * 3 / 2) - 1) << 1
    private var mask = cap - 1
    private var ks = new Array[Long](cap)
    private var vs = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    var keyCount: Int = 0
    private def slot(k: Long): Int = {
      // 64→32 bit mix (splitmix64 finalizer tail)
      var h = k * -7046029254386353131L
      h ^= h >>> 32
      var i = h.toInt & mask
      while (used(i) && ks(i) != k) i = (i + 1) & mask
      i
    }
    def getOrDefault(k: Long, dflt: Long): Long = {
      val i = slot(k); if (used(i)) vs(i) else dflt
    }
    def contains(k: Long): Boolean = used(slot(k))
    def put(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (!used(i)) {
        used(i) = true; ks(i) = k; n += 1; keyCount += 1
        if (n * 3 >= cap * 2) grow()
      }
      // re-resolve after a grow moved slots
      vs(slot(k)) = v
    }
    private def grow(): Unit = {
      val (oks, ovs, oused) = (ks, vs, used)
      cap <<= 1; mask = cap - 1
      ks = new Array[Long](cap); vs = new Array[Long](cap)
      used = new Array[Boolean](cap)
      var i = 0
      while (i < oks.length) {
        if (oused(i)) { val j = slot(oks(i)); used(j) = true; ks(j) = oks(i); vs(j) = ovs(i) }
        i += 1
      }
    }
    def foreachKey(f: Long => Unit): Unit = {
      var i = 0
      while (i < ks.length) { if (used(i)) f(ks(i)); i += 1 }
    }
  }

  /** Exact union-find with path compression over packed edge chunks
    * (ids interleaved: a0,b0,a1,b1,…). Union-by-min keeps every root the
    * minimum id of its component, so the final find IS the cluster
    * label. Returns packed (id, cluster) chunks — primitive end to end
    * (no boxing anywhere: [[LongLongMap]] parent table, long[] in and
    * out). */
  private def unionFindPacked(chunks: Array[Array[Long]]): Array[Array[Long]] = {
    val nEdgeEnds = chunks.iterator.map(_.length.toLong).sum
    val parent = new LongLongMap(
      math.min(64L * 1024 * 1024, math.max(64L, nEdgeEnds)).toInt)
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x
      while (parent.getOrDefault(c, c) != c) {
        val nx = parent.getOrDefault(c, c); parent.put(c, r); c = nx
      }
      r
    }
    chunks.foreach { a =>
      var i = 0
      while (i < a.length) {
        val x = a(i); val y = a(i + 1)
        if (!parent.contains(x)) parent.put(x, x)
        if (!parent.contains(y)) parent.put(y, y)
        val rx = find(x); val ry = find(y)
        if (rx != ry) { if (rx < ry) parent.put(ry, rx) else parent.put(rx, ry) }
        i += 2
      }
    }
    // snapshot keys before labeling: find() path-compresses (updates
    // values), and mutating during foreachKey is asking for trouble
    val keys = new scala.collection.mutable.ArrayBuilder.ofLong
    keys.sizeHint(parent.keyCount)
    parent.foreachKey(keys += _)
    val ids = keys.result()
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    val ChunkPairs = 1 << 20
    var i = 0
    while (i < ids.length) {
      val end = math.min(ids.length, i + ChunkPairs)
      val a = new Array[Long]((end - i) * 2)
      var j = 0
      while (i < end) { a(j) = ids(i); a(j + 1) = find(ids(i)); i += 1; j += 2 }
      out += a
    }
    out.toArray
  }

  /** Distributed min-label propagation with POINTER JUMPING.
    *
    * Round 12 (the first >1M-edge production input, x0_linkage's
    * 100-replica name chains at the 100× set, exposed two defects in the
    * plain 1-hop loop): a 1-hop pass needs O(diameter) rounds and
    * silently exited maxIter with WRONG labels on 100-node chains — each
    * round now follows the hop with pointer jumps so propagated distance
    * grows geometrically, and non-convergence THROWS; labels are eagerly
    * localCheckpoint'ed every round so the plan stays constant-size (the
    * old growing lineage pinned the driver stringifying trees).
    *
    * Round 13 (FlagshipProbe: CC was 30.4 s of x0_linkage's 35 s at the
    * 100× set; Cc2Probe decomposition — the cost was per-round
    * sequential-stage latency, not data):
    *  - TWO pointer jumps per round: hop+jump reaches ~2d+2 where
    *    hop+jump² reaches ~4d+4 — 100-node chains converge in 4 rounds
    *    instead of 8; each extra jump is one self-join of the |V|-row
    *    label table. maxIter bounds diameter at ≥ 4^maxIter.
    *  - join-free convergence test: the pre-round label rides through
    *    the checkpoint as an `old` column, so "anything changed?" is a
    *    filter-limit-count over the blocks just written, not another
    *    |V|⋈|V| join.
    *  - SHUFFLE_HASH hints on every loop join: with AQE off (see
    *    caller) the planner defaults to SortMergeJoin, and ~6 sorts of
    *    |V|-row tables per round dominated the round (Cc2Probe). The
    *    loop's joins are long-key equi-joins whose per-partition builds
    *    are bounded by the caller's partition sizing, exactly SHJ's
    *    regime.
    *  - a contraction variant (relabel edges per round, finish on the
    *    driver under `driverEdgeLimit`) was BUILT AND REVERTED here:
    *    against id-ordered chains a d-hop relabel drops only d edges
    *    per chain per round (measured 1.485M → 1.425M → … at the 100×
    *    set — linear, hours at 1000×). Don't re-try it; the fixpoint
    *    loop's cross-round jump composition is what makes convergence
    *    geometric. */
  private def distributedComponents(pairs: DataFrame, maxIter: Int): DataFrame = {
    val spark = pairs.sparkSession
    // Co-partitioning contract (round 13): localCheckpoint preserves the
    // physical outputPartitioning, so edges are pinned hash(dst, P) ONCE
    // and every round's label table leaves its checkpoint hash(id, P).
    // The two |V|⋈|E| joins of each round (neighbor-min and hop) are then
    // exchange-FREE — EnsureRequirements sees both sides hash-clustered
    // on the join key — cutting the round's sequential stage chain from
    // ~20 to ~8 (Cc2Probe; stage latency, not data volume, was the cost).
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .repartition(p, col("dst"))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .withColumn("cluster", col("id"))
      .repartition(p, col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val roundT0 = System.nanoTime()
      // 1-hop: each node adopts min(own, neighbors') label
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("cluster").as("nc"))
          .hint("shuffle_hash"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("nmin"))
      val hop = labels.join(neighborMin.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"),
          col("cluster").as("old"))
      // pointer jump ×2: cluster := label(label(cluster)). Every label is
      // itself a node id (labels are min node ids), so the self-join
      // always hits; the left join + coalesce only guards plan-level
      // nullability. Jumping never leaves the component: cluster(v) is a
      // node of v's component and min-composition is monotone decreasing.
      def jump(d: DataFrame): DataFrame =
        d.select(col("id"), col("cluster").as("mid"), col("old"))
          .join(d.select(col("id").as("mid"), col("cluster").as("root"))
            .hint("shuffle_hash"), Seq("mid"), "left")
          .select(col("id"), coalesce(col("root"), col("mid")).as("cluster"),
            col("old"))
      // convergence rides the checkpoint job itself: an observe() node
      // counts changed labels as the blocks are written, so the round is
      // ONE job — the old filter-limit-count over the checkpointed
      // blocks was a second job + scheduler barrier every round (round
      // 15, Cc2Probe: 2 of the ~12 stages/round). re-pin hash(id, p)
      // before the checkpoint so next round's joins stay exchange-free
      // (the jumps leave the table keyed by `mid`); unpersist targets
      // the checkpointed frame itself — a projection on top would not
      // release the blocks.
      val obs = org.apache.spark.sql.Observation()
      val next = jump(jump(hop)).repartition(p, col("id"))
        .observe(obs, sum(when(col("cluster") =!= col("old"), 1L)
          .otherwise(0L)).as("changed"))
        .localCheckpoint(true)
      val changed = obs.get("changed").asInstanceOf[Long]
      if (sys.env.contains("GRAFT_CC_TRACE"))
        println(f"[cc] round=$i changed=${changed > 0} " +
          f"t=${(System.nanoTime() - roundT0) / 1e6}%.0f ms")
      labels.unpersist(false)
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist(false)
    if (!converged) {
      labels.unpersist(false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter pointer-jumping " +
          "rounds (graph diameter > 4^maxIter) — raise maxIter")
    }
    labels.select(col("id"), col("cluster"))
  }

  /** Full near-dup dedup: keep the min-id representative of every near-dup
    * cluster, pass through everything unclustered. */
  def dedupNear(df: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams()): DataFrame = {
    // r16: the pair relation is localCheckpoint-backed (eager,
    // lineage-truncated) and the scale is handed to connectedComponents
    // as knownEdges — skipping its probe cache(). r17: the edge count now
    // rides the checkpoint materialization itself via observe() (one
    // action fewer — the separate pairs.count() job over the blocks is
    // gone; VERDICT r16 item 6).
    val (pairs, nEdges) =
      withCachedSketchCounted(df, idCol, textCol, p)(nearDupPairsFromSketch(_, p))
    val clusters = connectedComponents(pairs, knownEdges = Some(nEdges))
    val losers = clusters.filter(col("id") =!= col("cluster")).select(col("id"))
    df.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }
}

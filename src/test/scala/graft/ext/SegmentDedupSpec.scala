package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.ext.Multimodal.MediaRow

/** X89 [[SegmentDedup.sharedRuns]]: maximal shared runs with positions.
  * Pins the run-extent arithmetic, resolution contract, multi-run and
  * repeated-element alignment reporting, brute-force equivalence on
  * random sequences, the boilerplate cap, and the video frame-key
  * binding (shared byte-identical intros across different clips). */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def runs(df: DataFrame, minRun: Int,
      cap: Option[Int] = None): Set[(Long, Long, Long, Long, Long)] =
    SegmentDedup.sharedRuns(df, "id", "keys", minRun, cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue(),
        r.getAs[Number](3).longValue(), r.getAs[Number](4).longValue()))
      .toSet

  /** Reference: maximal diagonal stretches of equality ≥ minRun. */
  private def brute(seqs: Seq[(Long, Array[Long])], minRun: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    for {
      (ia, ka) <- seqs; (ib, kb) <- seqs if ia < ib
      d <- -(kb.length - 1) to (ka.length - 1)
    } {
      var i = math.max(0, d)
      while (i < ka.length && i - d < kb.length) {
        if (ka(i) == kb(i - d)) {
          val start = i
          while (i < ka.length && i - d < kb.length && ka(i) == kb(i - d)) i += 1
          if (i - start >= minRun)
            out += ((ia, ib, start.toLong, (start - d).toLong, (i - start).toLong))
        } else i += 1
      }
    }
    out.toSet
  }

  test("one shared middle run: extent and positions exact") {
    val a = (1L, Array(1L, 2L, 3L, 40L, 41L, 42L, 43L, 44L, 45L, 9L))
    val b = (2L, Array(40L, 41L, 42L, 43L, 44L, 45L, 77L))
    val df = Seq(a, b).toDF("id", "keys")
    assert(runs(df, minRun = 3) === Set((1L, 2L, 3L, 0L, 6L)))
    // resolution: a 2-element shared run is invisible at minRun = 3
    val c = Seq((1L, Array(1L, 2L, 9L)), (2L, Array(1L, 2L, 8L)))
      .toDF("id", "keys")
    assert(runs(c, minRun = 3).isEmpty)
  }

  test("two shared runs at different offsets are both reported maximally") {
    val a = (1L, Array(10L, 11L, 12L, 0L, 0L, 20L, 21L, 22L, 23L))
    val b = (2L, Array(20L, 21L, 22L, 23L, 5L, 10L, 11L, 12L, 6L))
    val df = Seq(a, b).toDF("id", "keys")
    assert(runs(df, minRun = 3) ===
      Set((1L, 2L, 0L, 5L, 3L), (1L, 2L, 5L, 0L, 4L)))
  }

  test("matches brute force on random sequences with planted overlaps") {
    val rnd = new scala.util.Random(7)
    val seqs = (0L until 12L).map { i =>
      val base = Array.fill(rnd.nextInt(20) + 8)(rnd.nextLong())
      // plant a shared block from a common pool at a random position
      val block = (0 until 5).map(j => 1000L + (i % 3) * 10 + j).toArray
      val at = rnd.nextInt(base.length - 1)
      (i, base.patch(at, block, math.min(block.length, base.length - at)))
    }
    val df = seqs.toDF("id", "keys")
    for (m <- Seq(2, 3, 4))
      assert(runs(df, minRun = m) === brute(seqs, m), s"minRun $m")
  }

  test("maxShingleFreq drops boilerplate windows") {
    // the zero-run is shared by ALL items (boilerplate); the planted
    // pair-only run must survive the cap
    val seqs = (0L until 6L).map(i =>
      (i, Array(0L, 0L, 0L, 0L) ++ Array(i * 100, i * 100 + 1, i * 100 + 2)))
    val withPair = seqs :+
      (10L, Array(55L, 56L, 57L, 58L)) :+ (11L, Array(55L, 56L, 57L, 58L))
    val df = withPair.toDF("id", "keys")
    val capped = runs(df, minRun = 3, cap = Some(3))
    assert(capped === Set((10L, 11L, 0L, 0L, 4L)),
      "boilerplate alignments capped away, genuine pair kept")
  }

  test("video binding: shared byte-identical intros across different clips") {
    def frame(seed: Long) = ImageDedup.encodeSmoothPng(16, 12, seed)
    def video(introGroup: Long, id: Long) = VideoDedup.encodeVideo(
      (0 until 5).map(i => frame(100000 + introGroup * 100 + i)) ++
        (0 until 6).map(j => frame(200000 + id * 100 + j)), fps = 8.0)
    val rows = (0L until 6L).map(i => MediaRow(i, s"v/$i", "video/gvid",
      video(i % 2, i))) :+ MediaRow(99, "corrupt", "video/gvid", Array[Byte](1))
    val keys = VideoDedup.frameKeys(spark.createDataset(rows))
    assert(keys.count() === 6, "corrupt container drops out of frameKeys")
    val got = runs(keys.select($"media_id".as("id"), $"keys"), minRun = 3)
    val want = (for {
      a <- 0L until 6L; b <- 0L until 6L if a < b && a % 2 == b % 2
    } yield (a, b, 0L, 0L, 5L)).toSet
    assert(got === want, "every same-group pair shares exactly the 5-frame intro")
  }

  test("audio binding: a shared jingle between different clips aligns on blocks") {
    // clip i = unique PCM, except clips 1 and 3 open with the same
    // 4-block (4 x 500 frames) jingle rendered from the same seed
    val block = 500
    def pcmWav(segSeeds: Seq[Long]): Array[Byte] = {
      val pcm = segSeeds.flatMap { s =>
        val rnd = new scala.util.Random(s)
        Array.fill(block * 2)(rnd.nextInt(256).toByte) // 16-bit mono frames
      }.toArray
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val jingle = Seq(900L, 901L, 902L, 903L)
    val rows = Seq(
      MediaRow(0, "a/0", "audio/wav", pcmWav(Seq(10L, 11L, 12L, 13L, 14L, 15L))),
      MediaRow(1, "a/1", "audio/wav", pcmWav(jingle ++ Seq(20L, 21L))),
      MediaRow(2, "a/2", "audio/wav", pcmWav(Seq(30L, 31L, 32L, 33L))),
      MediaRow(3, "a/3", "audio/wav", pcmWav(jingle ++ Seq(40L, 41L))),
      MediaRow(9, "corrupt", "audio/wav", Array[Byte](1, 2)))
    val keys = AudioDedup.blockKeys(spark.createDataset(rows), blockFrames = block)
    assert(keys.count() === 4, "corrupt clip drops out of blockKeys")
    val got = runs(keys.select($"media_id".as("id"), $"keys"), minRun = 3)
    assert(got === Set((1L, 3L, 0L, 0L, 4L)),
      "exactly the shared 4-block jingle, nothing else")
  }

  test("landmarkKeys: offset-shifted jingle recalled where blockKeys is blind") {
    def seg(seed: Long, nBytes: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(nBytes)(rnd.nextInt(256).toByte)
    }
    // one shared jingle planted at ARBITRARY byte offsets: 7002 vs 12346
    // (difference = 2672 frames — no block grid or phase aligns them)
    val jingle = seg(99L, 24000)
    val rows = Seq(
      MediaRow(0, "a/0", "audio/wav",
        AudioDedup.pcmToWav(seg(10L, 7002) ++ jingle ++ seg(11L, 4000), 8000)),
      MediaRow(1, "a/1", "audio/wav",
        AudioDedup.pcmToWav(seg(20L, 12346) ++ jingle ++ seg(21L, 2000), 8000)),
      MediaRow(2, "a/2", "audio/wav",
        AudioDedup.pcmToWav(seg(30L, 20000), 8000)))
    val ds = spark.createDataset(rows)
    // the fixed grid CANNOT pair them (offsets differ by a non-multiple
    // of any block size): the documented blockKeys caveat
    val blind = runs(AudioDedup.blockKeys(ds, blockFrames = 500)
      .select($"media_id".as("id"), $"keys"), minRun = 3)
    assert(blind.isEmpty, "block grid unexpectedly aligned the plant")
    // content-defined cuts land at the same in-jingle positions in both
    // clips regardless of offset: the interior chunks pair as one run
    val lk = AudioDedup.landmarkKeys(ds, divisor = 512)
    val found = runs(lk.select($"media_id".as("id"), $"keys"), minRun = 3)
    assert(found.nonEmpty, "offset-shifted jingle not recalled")
    assert(found.forall { case (a, b, _, _, _) => a == 0L && b == 1L },
      s"spurious pairs beyond the planted clips: $found")
    // the run must cover most of the jingle's ~47 interior chunks
    // (divisor 512 ⇒ expected cut every 512 bytes over 24000 bytes);
    // only the two edge chunks may differ
    assert(found.map(_._5).max >= 20,
      s"recalled run too short for the planted jingle: $found")
  }

  test("landmarkKeys offset invariance holds across arbitrary offsets (property)") {
    // the interior chunk keys of a segment are a pure function of its
    // content: any two placements share all but the edge chunks
    def seg(seed: Long, nBytes: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(nBytes)(rnd.nextInt(256).toByte)
    }
    val jingle = seg(7L, 16000)
    val offsets = Seq(0, 1, 2, 777, 5001, 12344) // incl. odd byte offsets
    val rows = offsets.zipWithIndex.map { case (off, i) =>
      MediaRow(i.toLong, s"p/$i", "audio/wav",
        AudioDedup.pcmToWav(seg(100L + i, off) ++ jingle ++
          seg(200L + i, 3000), 8000))
    }
    val keyRows = AudioDedup.landmarkKeys(
        spark.createDataset(rows), divisor = 512)
      .select($"media_id", $"keys").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    // interior keys (drop first and last chunk, which mix surround
    // bytes) must be IDENTICAL sequences across every placement
    def interior(id: Long): Vector[Long] = {
      val ks = keyRows(id)
      // the jingle occupies the tail minus the 3000-byte suffix: compare
      // via the longest common contiguous subsequence anchored by set
      // intersection — here simply: keys occurring in ALL placements
      ks
    }
    val shared = offsets.indices.map(i => interior(i.toLong).toSet)
      .reduce(_ & _)
    // ~31 expected interior jingle chunks at divisor 512; demand most
    assert(shared.size >= 15,
      s"only ${shared.size} chunk keys shared across all placements")
    // and they appear in the SAME relative order in every placement
    val orders = offsets.indices.map { i =>
      interior(i.toLong).filter(shared)
    }
    assert(orders.forall(_ == orders.head),
      "shared chunk keys disagree on order across placements")
  }
}

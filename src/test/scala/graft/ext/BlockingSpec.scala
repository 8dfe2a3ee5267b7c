package graft.ext

import scala.util.Random

import graft.SparkSpec

/** [[Blocking]] — sorted-neighborhood candidate generation. The pair set
  * is pinned COMPLETE against a local brute-force all-pairs-within-rank-
  * distance oracle for several windows and partition counts (including
  * partition counts far above the row count, so most partitions are
  * empty or smaller than the window — the cross-boundary strip logic's
  * hardest regime); the all-ties block pins linear pair count; the
  * corpus face is oracle-checked as x95_sorted_neighborhood. */
class BlockingSpec extends SparkSpec {
  import spark.implicits._

  /** (block, sort — nullable with planted ties, id, carry) */
  private def corpus(n: Int, blocks: Int, seed: Long) = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val sort =
        if (rnd.nextInt(20) == 0) null
        else s"k${rnd.nextInt(n / 4)}%04d" // dense -> frequent ties
      (rnd.nextInt(blocks), sort, i.toLong, s"payload-$i")
    }
  }

  /** all same-block pairs within rank distance `w` of the (sort
    * nulls-first, id) order — a direct restatement of the contract,
    * computed without Spark */
  private def brute(rows: Seq[(Int, String, Long, String)], w: Int) = {
    implicit val nullsFirst: Ordering[String] = (a, b) =>
      (a, b) match {
        case (null, null) => 0
        case (null, _)    => -1
        case (_, null)    => 1
        case (x, y)       => x.compareTo(y)
      }
    rows.groupBy(_._1).iterator.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      for {
        i <- sorted.indices
        j <- (i + 1) to math.min(i + w, sorted.length - 1)
      } yield (sorted(i)._3, sorted(j)._3,
        sorted(i)._4, sorted(j)._4)
    }.toSet
  }

  test("complete vs brute force for every window x partition-count combo") {
    val rows = corpus(n = 240, blocks = 5, seed = 7)
    val df = rows.toDF("block", "sort", "id", "payload")
    for {
      w <- Seq(1, 2, 4)
      np <- Seq(1, 7, 512) // 512 >> 240 rows: empty + sub-window partitions
    } {
      val got = Blocking
        .sortedNeighborhood(df, "id", Seq("block"), Seq("sort"), w,
          carry = Seq("payload"), numPartitions = Some(np))
        .as[(Long, Long, String, String)].collect().toSet
      assert(got === brute(rows, w), s"window=$w numPartitions=$np")
    }
  }

  test("a block of identical sort keys stays linear: w*n - w(w+1)/2 pairs") {
    val n = 2000
    val df = (0 until n).map(i => (1, "same", i.toLong, ""))
      .toDF("block", "sort", "id", "payload")
    val w = 3
    val count = Blocking
      .sortedNeighborhood(df, "id", Seq("block"), Seq("sort"), w,
        numPartitions = Some(16))
      .count()
    assert(count === w.toLong * n - w * (w + 1) / 2)
  }

  test("null block key is one block; blocks never pair across") {
    val df = Seq(
      (Option(1), "a", 1L), (Option(1), "b", 2L),
      (Option.empty[Int], "a", 3L), (Option.empty[Int], "b", 4L),
      (Option(2), "a", 5L)
    ).toDF("block", "sort", "id")
    val got = Blocking
      .sortedNeighborhood(df, "id", Seq("block"), Seq("sort"), window = 2,
        numPartitions = Some(3))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("multiPass unions passes under canonical orientation, deduped") {
    // ids sort OPPOSITE ways on the two keys, so each pass orients the
    // same logical pair differently and dedup must canonicalize
    val df = Seq(
      (1, "aa", "zz", 10L), (1, "ab", "zy", 20L), (1, "zz", "aa", 30L)
    ).toDF("block", "k1", "k2", "id")
    val got = Blocking
      .multiPass(df, "id", Seq("block"), Seq(Seq("k1"), Seq("k2")),
        window = 1, numPartitions = Some(2))
      .as[(Long, Long)].collect().toSet
    // pass k1 order: 10,20,30 -> (10,20),(20,30); pass k2 order:
    // 30,20,10 -> (30,20),(20,10) = same pairs flipped -> dedup to 2
    assert(got === Set((10L, 20L), (20L, 30L)))
  }

  test("multiPass second sort key recovers a pair the first pass misses") {
    // same-block near-duplicates whose k1 differs in position 1 (sort far
    // apart) but k2 is identical: the merge/purge motivation
    val df = Seq(
      (1, "apple", "zip1", "x", 1L), (1, "zpple", "zip1", "x", 2L),
      (1, "mango", "zip9", "y", 3L)
    ).toDF("block", "k1", "k2", "carry", "id")
    val p1 = Blocking.sortedNeighborhood(df, "id", Seq("block"), Seq("k1"),
      window = 1, numPartitions = Some(2)).as[(Long, Long)].collect().toSet
    assert(!p1.contains((1L, 2L))) // k1 alone misses it (mango between)
    val got = Blocking
      .multiPass(df, "id", Seq("block"), Seq(Seq("k1"), Seq("k2")),
        window = 1, carry = Seq("carry"), numPartitions = Some(2))
      .as[(Long, Long, String, String)].collect().toSet
    assert(got.map(p => (p._1, p._2)).contains((1L, 2L)))
    // carries follow the canonical orientation
    assert(got.forall { case (a, b, ca, cb) =>
      Seq(1L -> "x", 2L -> "x", 3L -> "y").toMap
        .forall(kv => (a != kv._1 || ca == kv._2) &&
          (b != kv._1 || cb == kv._2))
    })
  }
}

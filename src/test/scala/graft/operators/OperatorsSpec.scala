package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 12:00:00"), 200.0),
    (2L, ts("2024-01-01 11:00:00"), 300.0),
    (3L, ts("2024-01-01 09:00:00"), 400.0) // key with no metadata at all
  ).toDF("id", "ts", "v")

  private lazy val meta = Seq(
    (1L, ts("2024-01-01 09:00:00"), "m1a"),
    (1L, ts("2024-01-01 11:30:00"), "m1b"),
    (2L, ts("2024-01-01 11:00:00"), "m2a"), // exactly at event time → visible
    (2L, ts("2024-01-01 23:00:00"), "m2b")  // future → never matches
  ).toDF("id", "rts", "label")

  test("as-of join picks latest reference at-or-before each event") {
    val got = AsOfJoin(events, meta, Seq("id"), "ts", "rts")
      .select("id", "ts", "v", "label")
      .orderBy("id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, 100.0, "m1a"), // 10:00 → 09:00 revision
      (1L, 200.0, "m1b"), // 12:00 → 11:30 revision
      (2L, 300.0, "m2a"), // exact-time match visible
      (3L, 400.0, null))) // no reference → null
  }

  test("tolerance voids stale matches") {
    val got = AsOfJoin(events, meta, Seq("id"), "ts", "rts",
        toleranceMs = Some(30 * 60 * 1000L)) // 30 min
      .select("id", "ts", "label").orderBy("id", "ts")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, null),  // 10:00 vs 09:00 = 60 min stale
      (1L, "m1b"), // 12:00 vs 11:30 = 30 min, within tolerance
      (2L, "m2a"),
      (3L, null)))
  }

  test("a NULL in the matched revision is NOT backfilled from older revisions") {
    val ev = Seq((1L, ts("2024-01-01 12:00:00"), 1.0)).toDF("id", "ts", "v")
    val md = Seq(
      (1L, ts("2024-01-01 09:00:00"), "555", "old@x"),
      (1L, ts("2024-01-01 11:00:00"), null, "new@x") // latest: phone cleared
    ).toDF("id", "rts", "phone", "email")
    val got = AsOfJoin(ev, md, Seq("id"), "ts", "rts")
      .select("phone", "email").collect().head
    // the matched revision's legitimate NULL must survive, and both payload
    // fields must come from the SAME (latest) revision
    assert(got.isNullAt(0), s"phone resurrected: ${got.getString(0)}")
    assert(got.getString(1) === "new@x")
  }

  test("dotted payload and key names work (engine metadata schema)") {
    val ev = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("id", "ts")
    val md = Seq((1L, ts("2024-01-01 09:00:00"), "AK"))
      .toDF("id", "rts", "in.state")
    val got = AsOfJoin(ev, md, Seq("id"), "ts", "rts")
      .select(col("`in.state`")).collect().head.getString(0)
    assert(got === "AK")
  }

  test("sub-second tolerance works at microsecond precision") {
    val ev = Seq((1L, new Timestamp(1700000001500L), 1.0)) // t+1.5s
      .toDF("id", "ts", "v")
    val md = Seq((1L, new Timestamp(1700000000000L), "m"), // 1500 ms stale
      (1L, new Timestamp(1700000001300L), "fresh")) // 200 ms stale
      .toDF("id", "rts", "label")
    // 200 ms staleness allowed by a 250 ms tolerance, voided by 100 ms —
    // whole-second truncation would get both of these wrong
    val within = AsOfJoin(ev, md, Seq("id"), "ts", "rts",
      toleranceMs = Some(250L)).select("label").collect().head.getString(0)
    assert(within === "fresh")
    val voided = AsOfJoin(ev, md, Seq("id"), "ts", "rts",
      toleranceMs = Some(100L)).select("label").collect().head.getString(0)
    assert(voided === null)
  }

  test("forward direction picks the NEXT reference at-or-after; tolerance forward") {
    val got = AsOfJoin(events, meta, Seq("id"), "ts", "rts",
        direction = "forward")
      .select("id", "ts", "label")
      .as[(Long, Timestamp, Option[String])].collect().toSet
    assert(got === Set(
      (1L, ts("2024-01-01 10:00:00"), Some("m1b")), // next is 11:30
      (1L, ts("2024-01-01 12:00:00"), None),        // nothing after noon
      (2L, ts("2024-01-01 11:00:00"), Some("m2a")), // at-instant visible
      (3L, ts("2024-01-01 09:00:00"), None)))
    val tol = AsOfJoin(events, meta, Seq("id"), "ts", "rts",
        toleranceMs = Some(60L * 60 * 1000), direction = "forward")
      .select("id", "ts", "label")
      .as[(Long, Timestamp, Option[String])].collect().toSet
    // 10:00 → 11:30 is 90 min: beyond a 60-min forward tolerance
    assert(tol.contains((1L, ts("2024-01-01 10:00:00"), None)))
  }

  test("nearest join picks min |delta| with backward ties") {
    val buys = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),  // 30 min after the 10:00 view
      (1L, ts("2024-01-01 13:00:00"), 3.0),  // 60 min after the 12:00 view
      (2L, ts("2024-01-01 10:00:00"), 4.0),
      (2L, ts("2024-01-01 12:00:00"), 5.0)   // EXACT tie around 11:00
    ).toDF("id", "bts", "bv")
    val got = NearestJoin(events, buys, Seq("id"), "ts", "bts")
      .select("id", "ts", "bv")
      .as[(Long, Timestamp, Option[Double])].collect().toSet
    assert(got === Set(
      (1L, ts("2024-01-01 10:00:00"), Some(2.0)), // 30 min fwd beats 60 back
      (1L, ts("2024-01-01 12:00:00"), Some(3.0)), // 60 fwd beats 90 back
      (2L, ts("2024-01-01 11:00:00"), Some(4.0)), // tie → backward
      (3L, ts("2024-01-01 09:00:00"), None)))
  }

  test("brute-force differential on random data") {
    val rnd = new scala.util.Random(7)
    val ev = (1 to 300).map(_ => (rnd.nextInt(5).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), rnd.nextDouble()))
    val md = (1 to 80).map(i => (rnd.nextInt(5).toLong,
      new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), s"r$i"))
    val evDf = ev.toDF("id", "ts", "v")
    val mdDf = md.toDF("id", "rts", "label")
    val got = AsOfJoin(evDf, mdDf, Seq("id"), "ts", "rts")
      .select("id", "ts", "label").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet
    val expected = ev.map { case (id, t, _) =>
      val candidates = md.filter(m => m._1 == id && !m._2.after(t))
      val best = if (candidates.isEmpty) null
        else candidates.maxBy(m => (m._2.getTime, m._3))._3
      (id, t, best)
    }.toSet
    // ties on (id, rts): both engines pick the window-last row; compare on
    // match-time instead of label to stay deterministic
    val gotTimes = got.map { case (id, t, _) => (id, t) }
    assert(gotTimes === expected.map { case (id, t, _) => (id, t) })
    val nullGot = got.filter(_._3 == null).map(x => (x._1, x._2))
    val nullExp = expected.filter(_._3 == null).map(x => (x._1, x._2))
    assert(nullGot === nullExp)
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals theta join") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("pid", "x")
    val ivals = (1 to 50).map { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 20)
    }.toDF("iid", "lo", "hi")
    val binned = RangeJoin.binned(points, "x", ivals, "lo", "hi", binWidth = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val theta = points.join(ivals, $"x" >= $"lo" && $"x" < $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned === theta)
    assert(binned.nonEmpty)
  }
}

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without exchange (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    // stale managed-table dirs from a previous crashed run block CREATE
    for (t <- Seq("b_orders", "b_lines")) {
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("okey", "oval")
    val lines = (1L to 5000L).map(i => (i % 1000 + 1, i)).toDF("okey", "line")
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    lines.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lines")

    // force the sort-merge path (broadcast would win on tiny test tables)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lines"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected bucket-co-located join without shuffle, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() === 5000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}

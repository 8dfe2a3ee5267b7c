package graft.etl

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Full-fidelity parity with the reference transform: the complete 51-column
  * energy schema through HourlyAggregate and JobRunner (FIXTURES §A.1-A.2). */
class EtlParitySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def energyFixture() = {
    val rnd = new scala.util.Random(3)
    val rows = for {
      b <- Seq(11L, 22L); q <- 0 until 8
    } yield Row.fromSeq(
      new Timestamp(ts("2024-02-01 00:00:00").getTime + q * 15 * 60 * 1000L) +:
        b +: SchemaDefs.energyColumns.map(_ => rnd.nextDouble() * 100))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      SchemaDefs.timeseriesSchema)
  }

  test("all 51 energy columns aggregate with the exact published schema") {
    val out = HourlyAggregate(energyFixture())
    assert(out.columns.toSeq === SchemaDefs.hourlyOutputColumns)
    val rows = out.collect()
    assert(rows.length === 4) // 2 buildings × 2 hours
    // every mean is within the group's sample bounds and non-null
    rows.foreach { r =>
      (3 until r.length).foreach(i => assert(!r.isNullAt(i)))
    }
  }

  test("full config → runAll over two jobs; ledger JSON escapes cleanly") {
    val root = Files.createTempDirectory("graft_cfg").toString
    val df = energyFixture()
    // same data under two states, hive layout
    for (st <- Seq("AK", "CA")) {
      df.withColumn("upgrade", lit(0)).withColumn("state", lit(st))
        .write.mode("append").partitionBy("upgrade", "state")
        .parquet(s"$root/src_$st")
    }
    val cfg = EtlConfig.fromJson(
      s"""{
         |  "output_root": "$root/out",
         |  "job_specific": [
         |    {"release_name": "r", "release_year": "2024", "state": "AK",
         |     "upgrades": [0], "src_root": "$root/src_AK", "metadata_root": "$root/meta"},
         |    {"release_name": "r", "release_year": "2024", "state": "CA",
         |     "upgrades": [0], "src_root": "$root/src_CA", "metadata_root": "$root/meta"}
         |  ]
         |}""".stripMargin)
    val results = JobRunner.runAll(spark, cfg, "runx")
    assert(results.length === 2)
    results.foreach { r =>
      assert(r.ledger.discrepancies.isEmpty)
      assert(r.ledger.outputRows === 4)
      // valid JSON (driver-parseable)
      val json = r.ledger.toJson
      assert(json.contains("\"listed\""))
      assert(new com.fasterxml.jackson.databind.ObjectMapper().readTree(json) != null)
    }
    // each job has its own subdir under the run-stamped root — the second
    // job's mode(overwrite) must NOT have destroyed the first job's output
    assert(results.map(_.dataOut).distinct.length === 2)
    results.zip(Seq("AK", "CA")).foreach { case (r, st) =>
      val surviving = spark.read.parquet(r.dataOut)
      assert(surviving.count() === 4)
      assert(surviving.select("state").distinct().collect().map(_.getString(0)).toSeq === Seq(st))
    }
  }

  test("parallel runAll produces the same outputs as sequential") {
    val root = Files.createTempDirectory("graft_par").toString
    val df = energyFixture()
    for (st <- Seq("AK", "CA", "TX")) {
      df.withColumn("upgrade", lit(0)).withColumn("state", lit(st))
        .write.mode("append").partitionBy("upgrade", "state")
        .parquet(s"$root/src_$st")
    }
    val jobs = Seq("AK", "CA", "TX").map(st =>
      JobSpec("r", "2024", st, Seq(0), s"$root/src_$st", s"$root/meta"))
    val cfg = EtlConfig(s"$root/out", jobs)
    val par = JobRunner.runAllParallel(spark, cfg, "runp")
    assert(par.length === 3)
    par.foreach { r =>
      assert(r.ledger.discrepancies.isEmpty)
      assert(r.ledger.outputRows === 4)
      assert(spark.read.parquet(r.dataOut).count() === 4)
    }
    // results come back in job order regardless of completion order
    assert(par.map(_.dataOut).map(_.split('/').last) === Seq("AK", "CA", "TX"))
  }

  test("re-running one upgrade leaves sibling upgrade partitions intact") {
    val root = Files.createTempDirectory("graft_dyn").toString
    val df = energyFixture()
    for (u <- Seq(0, 1)) {
      df.withColumn("upgrade", lit(u)).withColumn("state", lit("AK"))
        .write.mode("append").partitionBy("upgrade", "state")
        .parquet(s"$root/src")
    }
    def spec(us: Seq[Int]) =
      JobSpec("r", "2024", "AK", us, s"$root/src", s"$root/meta")
    // write both upgrades, then overwrite only upgrade=1
    JobRunner.run(spark, spec(Seq(0, 1)), s"$root/out", "runx")
    val res = JobRunner.run(spark, spec(Seq(1)), s"$root/out", "runx")
    val out = spark.read.parquet(res.dataOut)
    // upgrade=0 output survived the upgrade=1-only overwrite
    assert(out.select("upgrade").distinct().collect().map(_.getInt(0)).toSet === Set(0, 1))
    assert(out.count() === 8)
  }

  test("job with zero matching partitions yields an empty, well-formed result") {
    val root = Files.createTempDirectory("graft_empty").toString
    val spec = JobSpec("r", "2024", "ZZ", Seq(5), s"$root/nowhere", s"$root/nometa")
    val res = JobRunner.run(spark, spec, s"$root/out", "r1")
    assert(res.ledger.listed === 0)
    assert(res.ledger.inputRows === 0)
    assert(res.ledger.discrepancies.isEmpty)
  }

  private def writeMeta(root: String, state: String): Unit = {
    import spark.implicits._
    Seq((1L, state)).toDF("bldg_id", "in_state").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/m0_$state")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/m0_$state/*.parquet")).head.getPath
    val mdir = new org.apache.hadoop.fs.Path(s"$root/meta/state=$state/parquet")
    fs.mkdirs(mdir)
    fs.copyFromLocalFile(false, true, src,
      new org.apache.hadoop.fs.Path(mdir, s"${state}_baseline_basic_metadata_and_annual_results.parquet"))
    fs.copyFromLocalFile(false, true, src,
      new org.apache.hadoop.fs.Path(mdir, s"${state}_baseline_metadata_and_annual_results.parquet"))
  }

  test("metadata bypass runs even when no data partitions exist") {
    val root = Files.createTempDirectory("graft_metaonly").toString
    writeMeta(root, "AK")
    val spec = JobSpec("r", "2024", "AK", Seq(0), s"$root/no_data_here", s"$root/meta")
    val res = JobRunner.run(spark, spec, s"$root/out", "r1")
    assert(res.ledger.listed === 0)
    assert(res.ledger.bypassed === 2) // reference copies metadata unconditionally
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(s"${res.metadataOut}/*.parquet")).length === 2)
  }

  test("two releases of the same state keep separate metadata outputs") {
    val root = Files.createTempDirectory("graft_metaiso").toString
    writeMeta(root, "AK")
    def spec(rel: String) = JobSpec(rel, "2024", "AK", Seq(0), s"$root/no_data", s"$root/meta")
    val r23 = JobRunner.run(spark, spec("rel2023"), s"$root/out", "runx")
    val r24 = JobRunner.run(spark, spec("rel2024"), s"$root/out", "runx")
    assert(r23.metadataOut !== r24.metadataOut)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    // both copies survive — the shared filename no longer clobbers
    Seq(r23, r24).foreach { r =>
      assert(fs.globStatus(new org.apache.hadoop.fs.Path(s"${r.metadataOut}/*.parquet")).length === 2)
    }
  }
}

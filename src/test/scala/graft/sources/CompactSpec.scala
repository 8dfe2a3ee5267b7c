package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("many small files rewrite to few target-sized files, data intact") {
    val root = Files.createTempDirectory("graft_compact").toString
    // 40 tiny files
    (1 to 40).foreach { i =>
      Seq((i.toLong, s"payload_$i" * 50)).toDF("id", "payload")
        .coalesce(1).write.mode("append").parquet(s"$root/src")
    }
    val (filesBefore, bytes) = Compact.dirStats(spark, s"$root/src")
    assert(filesBefore === 40)

    val stats = Compact.parquetDir(spark, s"$root/src", s"$root/out",
      targetFileBytes = bytes / 3)
    assert(stats.outFiles === 3 || stats.outFiles === 4) // ceil(bytes / (bytes/3))
    val (filesAfter, _) = Compact.dirStats(spark, s"$root/out")
    assert(filesAfter === stats.outFiles)
    // content unchanged
    val before = spark.read.parquet(s"$root/src").orderBy("id").collect()
    val after = spark.read.parquet(s"$root/out").orderBy("id").collect()
    assert(after === before)
  }
}

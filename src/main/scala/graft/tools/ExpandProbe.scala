package graft.tools
import org.apache.spark.sql.functions._
object ExpandProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("8", appName = "expand-probe")
    val root = java.nio.file.Files.createTempDirectory("expandmv").toString
    val li = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    li.write.mode("overwrite").parquet(s"$root/base")
    graft.etl.MaterializedRollup.createAndRegister(spark, "probe_mv",
      s"$root/base", s"$root/mv",
      keys = Seq("l_returnflag", "l_linestatus"), measures = Seq("l_quantity"))
    spark.read.parquet(s"$root/base").createOrReplaceTempView("li")
    val df = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) c, sum(l_quantity) s,
        | avg(l_quantity) a, min(l_quantity) mn
        |FROM li GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)
    val scanned = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    println("scans-mv=" + scanned.exists(_.contains("/mv")) +
      " scans-base=" + scanned.exists(_.contains("/base")))
    // compare against rule-off
    spark.conf.set(graft.plans.RollupViewRewrite.EnabledKey, "false")
    val off = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) c, sum(l_quantity) s,
        | avg(l_quantity) a, min(l_quantity) mn
        |FROM li GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    spark.conf.unset(graft.plans.RollupViewRewrite.EnabledKey)
    val on = df.collect().map(_.toString).sorted.toSeq
    println("results-equal=" + (on == off) + " rows=" + on.size)
    graft.plans.RollupViewRewrite.unregister("probe_mv")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object Q54Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(appName = "q54-probe2")
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    graft.core.Tables.load(spark, dir, "customer").createOrReplaceTempView("c")
    graft.core.Tables.load(spark, dir, "orders").createOrReplaceTempView("o")
    def run(tag: String, sql: String): Unit = {
      def f(): Unit = spark.sql(sql).write.format("noop").mode("overwrite").save()
      (1 to 2).foreach(_ => f())
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-22s ${ts.sorted.apply(1)}%6.2fs")
    }
    val base =
      """SELECT c_custkey, c_acctbal FROM c
        | WHERE EXISTS (SELECT 1 FROM o WHERE o.o_custkey = c.c_custkey
        |   AND o.o_totalprice > c.c_acctbal * 10)
        |   AND NOT EXISTS (SELECT 1 FROM o o2 WHERE o2.o_custkey = c.c_custkey
        |   AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 5000)
        | ORDER BY c_custkey""".stripMargin
    run("smj_as_is", base)
    run("hint_in_subq",
      """SELECT c_custkey, c_acctbal FROM c
        | WHERE EXISTS (SELECT /*+ SHUFFLE_HASH(o) */ 1 FROM o
        |   WHERE o.o_custkey = c.c_custkey
        |   AND o.o_totalprice > c.c_acctbal * 10)
        |   AND NOT EXISTS (SELECT /*+ SHUFFLE_HASH(o2) */ 1 FROM o o2
        |   WHERE o2.o_custkey = c.c_custkey
        |   AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 5000)
        | ORDER BY c_custkey""".stripMargin)
    val hinted = spark.sql(
      """SELECT c_custkey, c_acctbal FROM c
        | WHERE EXISTS (SELECT /*+ SHUFFLE_HASH(o) */ 1 FROM o
        |   WHERE o.o_custkey = c.c_custkey
        |   AND o.o_totalprice > c.c_acctbal * 10)
        |   AND NOT EXISTS (SELECT /*+ SHUFFLE_HASH(o2) */ 1 FROM o o2
        |   WHERE o2.o_custkey = c.c_custkey
        |   AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 5000)
        | ORDER BY c_custkey""".stripMargin)
    println(hinted.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Join")).mkString("\n"))
    spark.stop()
  }
}

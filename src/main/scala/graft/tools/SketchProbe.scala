package graft.tools
import org.apache.spark.sql.functions._
/** Round-11 probe: exactness regimes for a3/a4 promotion.
  * (1) approx_count_distinct at tight rsd on a bounded SF-stable slice —
  * exact? (2) percentile_approx at accuracy >> n — which rank convention,
  * and does DuckDB quantile_disc match? */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("8", appName = "sketch-probe")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val o = graft.core.Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") < 300)
    for (rsd <- Seq(0.05, 0.01, 0.005)) {
      val r = o.agg(
        approx_count_distinct(col("o_custkey"), rsd).as("a"),
        countDistinct(col("o_custkey")).as("e")).collect().head
      println(s"a3 rsd=$rsd approx=${r.getLong(0)} exact=${r.getLong(1)}")
    }
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 2000)
    val q = li.groupBy(col("l_returnflag"))
      .agg(
        element_at(percentile_approx(col("l_extendedprice"),
          typedlit(Seq(0.5, 0.95)), lit(100000)), 1).as("p50"),
        element_at(percentile_approx(col("l_extendedprice"),
          typedlit(Seq(0.5, 0.95)), lit(100000)), 2).as("p95"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag")).collect()
    q.foreach(r => println(s"a4 ${r.getString(0)} p50=${r.get(1)} p95=${r.get(2)} n=${r.getLong(3)}"))
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = core.Sessions.local(appName = "graft-edgeprobe")
    val dir = args.headOption.getOrElse("/tmp/sf10")
    import graft.functions.ColumnOps.jaroWinklerSim
    val cust = core.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val planted = cust.unionByName(
      cust.filter(col("c_custkey") < 30)
        .select((col("c_custkey") + 1000000000000L).as("c_custkey"),
          concat(lit(" "), upper(col("c_name")), lit(" ")).as("c_name"),
          col("c_nationkey")))
    val norm = planted.withColumn("nm", lower(trim(col("c_name"))))
    val wNbr = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("nm"), col("c_custkey"))
    val cross = norm
      .withColumn("nm_next", lead(col("nm"), 1).over(wNbr))
      .withColumn("id_next", lead(col("c_custkey"), 1).over(wNbr))
      .filter(col("nm_next").isNotNull && col("nm") =!= col("nm_next") &&
        jaroWinklerSim(col("nm"), col("nm_next")) >= 0.99)
      .select(col("c_custkey"), col("id_next"), col("nm"), col("nm_next"),
        jaroWinklerSim(col("nm"), col("nm_next")).as("jw"))
    println("[edgeprobe] cross-name edges: " + cross.count())
    cross.limit(5).collect().foreach(r => println("[edgeprobe] " + r))
    spark.stop()
  }
}

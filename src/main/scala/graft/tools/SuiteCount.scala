package graft.tools

/** Prints suite composition: total entries, oracle-checked, Tier-B list. */
object SuiteCount {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries
    val os = graft.SparkEntry.oracleSql
    val noOracle = qs.keySet -- os.keySet
    println(s"queries=${qs.size} oracle=${os.size} tierB=${noOracle.size}")
    println(noOracle.toSeq.sorted.mkString(", "))
  }
}

package org.apache.spark.sql

/** Test-only bridge: apply a SparkSessionExtensions configurator to an
  * already-running session's function registry (builder.withExtensions is a
  * no-op when getOrCreate returns an existing session, so suites sharing one
  * session can't exercise injection the normal way). */
object TestExtensionsBridge {
  def applyFunctions(spark: SparkSession, f: SparkSessionExtensions => Unit): Unit = {
    val ext = new SparkSessionExtensions
    f(ext)
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }
}

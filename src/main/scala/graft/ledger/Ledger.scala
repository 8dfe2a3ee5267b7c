package graft.ledger

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's operational-correctness net (M3/A5,
  * `/root/reference/etl/oedi_etl/monitor.py:44-137`): per-stage monotonic
  * counters plus a set-diff of listed-vs-uploaded files reported as
  * "Listed but not Uploaded" (worked example
  * `/root/reference/README.md:339-362`).
  *
  * Spark re-expression: counters come from `Observation` metrics collected
  * during the single pass over the data (no second scan); the set-diff is a
  * left-anti join between the driver's file listing and the distinct
  * `_metadata.file_path` values actually read. The anti-join runs as a
  * DataFrame plan, so a 100 TB run with millions of input files never
  * materializes the file sets on the driver.
  */
object Ledger {

  final case class Report(
      listed: Long,
      processed: Long,
      bypassed: Long,
      inputRows: Long,
      outputRows: Long,
      discrepancies: Seq[String]) {

    /** Reference-shaped summary JSON (monitor.py:108-137). */
    def toJson: String = {
      // control characters (newline/tab are legal in POSIX file names) must
      // be \u-escaped or the one-line JSON protocol breaks
      def esc(s: String) = s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val files = discrepancies.map(f => "\"" + esc(f) + "\"").mkString("[", ",", "]")
      s"""{"counts":{"listed":$listed,"processed":$processed,"bypassed":$bypassed,""" +
        s""""input_rows":$inputRows,"output_rows":$outputRows},""" +
        s""""discrepancy":{"stage":"Listed but not Uploaded","files":$files}}"""
    }
  }

  /** `listed EXCEPT processed` as a distributed anti-join.
    * @param listed    one column `path` — every file the driver enumerated
    * @param processed one column `path` — every file that produced rows */
  def discrepancy(listed: DataFrame, processed: DataFrame): DataFrame =
    listed.join(processed, Seq("path"), "left_anti")

  /** Lift a driver-side path list into a single-column DataFrame. */
  def pathsDf(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.createDataset(paths).toDF("path")
  }
}

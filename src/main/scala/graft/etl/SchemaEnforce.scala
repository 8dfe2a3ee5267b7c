package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Declared-schema enforcement for ETL input (SURVEY §2 S2; the gap the
  * round-2 review ranked #1): the reference re-crawls schemas every run and
  * its README documents the shared-metadata-table drift quirk
  * (`/root/reference/README.md:370`, crawler config `main.py:114-148`).
  * This engine inverts that: the job DECLARES the schema it processes
  * (`JobSpec.declaredSchema`), the scan reads with it — a file missing a
  * declared column yields nulls, extra columns are ignored, output schema
  * never drifts — and the per-file deviation is REPORTED, the way the
  * reference logs per-file column errors (`transform.py:121-122`,
  * `README.md:337-361`), instead of silently winning or losing a footer
  * race.
  *
  * Detection reads ONLY parquet footers, distributed over the executors
  * (file-count-bounded work, no row data): at 100 TB with millions of
  * files this is a listing-sized job, not a data-sized one.
  */
object SchemaEnforce {

  /** One drifted file: which declared columns its footer lacks, which
    * undeclared columns it carries. */
  final case class Drift(path: String, missing: Seq[String], extra: Seq[String])

  /** Hadoop `Configuration` is not `Serializable`; ship it to executors via
    * its own `Writable` contract (the same trick Spark's internal
    * `SerializableConfiguration` uses, which is `private[spark]`). */
  final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Footer-vs-declared column diff for every listed file. Partition
    * columns (`upgrade=`/`state=` path segments) live in directory names,
    * not footers, so they are excluded from the declared set before
    * diffing. Unreadable footers are skipped here — the corrupt-file path
    * already surfaces them as ledger discrepancies. */
  def detect(
      spark: SparkSession,
      files: Seq[String],
      declaredCols: Seq[String],
      partitionCols: Set[String] = Set("upgrade", "state")): Seq[Drift] = {
    if (files.isEmpty) return Nil
    val declared = declaredCols.filterNot(partitionCols.contains).toSet
    val confBc = spark.sparkContext.broadcast(
      new SerializableConf(spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(files.size, 32))
    spark.sparkContext.parallelize(files, slices).mapPartitions { paths =>
      import scala.jdk.CollectionConverters._
      val conf = confBc.value.value
      paths.flatMap { p =>
        try {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(p), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          val names =
            try reader.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet
            finally reader.close()
          val missing = (declared -- names).toSeq.sorted
          val extra = (names -- declared).toSeq.sorted
          if (missing.isEmpty && extra.isEmpty) None
          else Some(Drift(p, missing, extra))
        } catch {
          case _: Exception => None // unreadable footer = corrupt-file path
        }
      }
    }.collect().toSeq.sortBy(_.path)
  }
}

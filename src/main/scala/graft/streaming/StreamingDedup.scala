package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextStats

/** Streaming exact dedup at ingestion (X1 on an unbounded feed): content
  * fingerprint + stateful `dropDuplicates` keyed on it. State is bounded by
  * the watermark — duplicates arriving later than `retention` after the
  * first copy are not caught (the standard at-scale tradeoff; unbounded
  * retention would grow state forever on a 100 TB/day feed).
  */
object StreamingDedup {

  /** @param stream  streaming DataFrame with a text column and an event-time
    *                column
    * @param retention watermark horizon for duplicate state */
  def exactByContent(stream: DataFrame, textCol: String, timeCol: String,
      retention: String = "1 hour"): DataFrame =
    stream
      .withColumn("__fp", TextStats.fingerprint64(col(textCol)))
      .withWatermark(timeCol, retention)
      .dropDuplicates("__fp")
      .drop("__fp")
}

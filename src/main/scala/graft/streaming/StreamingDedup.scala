package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextStats

/** Streaming exact dedup at ingestion (X1 on an unbounded feed): content
  * fingerprint + stateful `dropDuplicatesWithinWatermark` keyed on it.
  * State IS evicted by the watermark (plain `dropDuplicates` on a non-time
  * key would keep every fingerprint forever): a fingerprint's state row is
  * dropped once the watermark passes its first-seen event time plus
  * `retention`. Duplicates arriving later than `retention` after the first
  * copy are therefore not caught — the standard at-scale tradeoff;
  * unbounded retention would grow state forever on a 100 TB/day feed.
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
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}

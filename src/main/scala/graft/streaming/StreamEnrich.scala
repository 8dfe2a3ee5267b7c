package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stream-static enrichment: join a change/event stream against a static
  * dimension (the streaming face of the reference's metadata-join-at-
  * query-time decision — `README.md:127,220` defers the dimension join
  * out of the ETL; a streaming consumer performs exactly this join
  * per micro-batch).
  *
  * Scale shape: the dimension is BROADCAST — a stream-static equi-join
  * needs no stream state (nothing to watermark: the static side never
  * changes mid-query) and no shuffle of the stream; each micro-batch is
  * a map-side hash join at scan speed. LEFT join so unmatched events
  * keep flowing — an enrichment must never drop data (route
  * `dim_key IS NULL` rows to a quarantine sink downstream when strict
  * referential integrity is required; [[graft.ext.Checks.RefIntegrity]]
  * is the batch-side audit of the same contract).
  *
  * The static side is re-resolved per RESTART, not per batch — a
  * dimension refresh needs a query restart (or model the dimension as a
  * second stream and use [[StreamJoin]]).
  */
object StreamEnrich {
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one join key")
    stream.join(broadcast(dim), keys, "left")
  }
}

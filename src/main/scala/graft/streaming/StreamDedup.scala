package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once ingestion dedup for an at-least-once delivery stream —
  * the standard front gate of a streaming training-data pipeline (the
  * batch twin is [[graft.ops.Dedup.exactGroups]]).
  *
  * `dropDuplicatesWithinWatermark` keys the dedup state on `idCols` and
  * EVICTS each key once the watermark passes its event time + horizon —
  * state is O(events inside the horizon), not O(stream history), which is
  * what lets this run forever at 100 TB/day. The contract is explicit: a
  * duplicate redelivered within `horizon` of the original is dropped; a
  * redelivery arriving later than the horizon is late data and falls out
  * of the dedup guarantee (tune the horizon to the delivery layer's
  * maximum redelivery lag, e.g. the replication queue's retention).
  */
object StreamDedup {

  /** `src` is a STREAMING DataFrame; `tsCol` the event-time column the
    * watermark rides on. Returns the deduplicated stream for the caller
    * to sink. */
  def dedupWithinHorizon(src: DataFrame, idCols: Seq[String], tsCol: String,
                         horizon: String): DataFrame = {
    require(idCols.nonEmpty, "need at least one id column")
    src.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(idCols)
  }
}

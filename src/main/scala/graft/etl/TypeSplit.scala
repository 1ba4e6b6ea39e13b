package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.EventSchema

/** O-12/O-13: the six-way type split and per-event filters.
  *
  * Reference: seghouse/jobs/send_to_warehouse.py:357-368 — six equality
  * predicates on `type`; rows with any other type are silently dropped.
  *
  * Scale note: each stream is a filter over the SAME parsed batch; callers
  * that consume several streams should `persist()` the parsed input first
  * (done in jobs.SendToWarehouseJob) so the source is read once, not six
  * times. The filters themselves are narrow and pushdown-eligible.
  */
object TypeSplit {

  /** type value -> filtered stream. Drops unknown types by construction. */
  def breakDownByType(df: DataFrame): Map[String, DataFrame] =
    EventSchema.EventTypes.map { t =>
      t -> df.filter(col(EventSchema.TypeCol) === lit(t))
    }.toMap

  /** O-13: one stream per distinct track event name. The distinct-name list
    * is bounded by design (it drives table fan-out), so a driver-side
    * collect is acceptable here — mirroring the reference's
    * `sorted(tracks.event.unique())` (send_to_warehouse.py:215). */
  def distinctEventNames(tracks: DataFrame): Seq[String] =
    tracks.select(EventSchema.EventCol).distinct()
      .orderBy(EventSchema.EventCol)
      .collect().map(_.getString(0)).toSeq

  def filterEvent(tracks: DataFrame, eventName: String): DataFrame =
    tracks.filter(col(EventSchema.EventCol) === lit(eventName))
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.EventSchema._
import graft.util.Names

/** Row-level normalization operators (reference O-6..O-11), all expressed
  * with built-in codegen'd functions — no UDFs, so every step stays inside
  * whole-stage codegen and is a narrow (shuffle-free) transform.
  */
object Normalize {

  /** O-6: drop configured skip-fields; missing names are ignored (Spark's
    * drop is already lenient, matching `errors='ignore'`). */
  def dropSkipFields(df: DataFrame, skipFields: Seq[String]): DataFrame =
    df.drop(skipFields: _*)

  /** O-7: allowlist + prefix projection for the shared tracks table: keep
    * columns in (base schema ∪ extra timestamp names) or starting with one
    * of the allowed prefixes (reference send_to_warehouse.py:309-320). */
  def selectTracksColumns(df: DataFrame, extraTimestampNames: Seq[String]): DataFrame = {
    val keep = (tracks.fieldNames ++ extraTimestampNames :+ UnixTimestampInMillis).toSet
    val cols = df.columns.filter(c => keep(c) || TracksAllowedFieldPrefixes.exists(c.startsWith))
    df.select(cols.map(col).toIndexedSeq: _*)
  }

  /** O-8: parse the string timestamp fields (received_at, sent_at,
    * timestamp) that are present. Segment emits ISO-8601 UTC; `to_timestamp`
    * handles the `Z` suffix under the UTC session timezone. */
  def parseTimestamps(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    TimestampFields.filter(present).foldLeft(df) { (d, f) =>
      d.withColumn(f, to_timestamp(col(f)))
    }
  }

  /** The O-9 normalization chain as a Column (for values), provably the same
    * transformation as [[Names.normalizeEventName]] (for driver-side names):
    * drop spaces, `&`->`and`, decamelize (two regex passes), lowercase. */
  def normalizeEventNameCol(c: Column): Column =
    lower(
      regexp_replace(
        regexp_replace(
          regexp_replace(regexp_replace(c, " ", ""), "&", "and"),
          Names.acronymBoundaryPattern, "$1_$2"),
        Names.camelBoundaryPattern, "$1_$2"))

  /** O-9: tracks-only — save `original_event`, normalize `event`. */
  def normalizeEventName(tracksDf: DataFrame): DataFrame =
    tracksDf
      .withColumn(OriginalEventCol, col(EventCol))
      .withColumn(EventCol, normalizeEventNameCol(col(EventCol)))

  /** O-10: extra-timezone columns. `from_utc_timestamp` yields the naive
    * local wall-clock instant, matching the reference's
    * `tz_convert(tz).tz_localize(None)`. Collision with an existing column
    * is a hard error (reference send_to_warehouse.py:73-75). */
  def extraTimestamps(df: DataFrame, extra: Map[String, String]): DataFrame =
    extra.foldLeft(df) { case (d, (name, tz)) =>
      require(!d.columns.contains(name), s"Column with $name already exist")
      d.withColumn(name, from_utc_timestamp(col(Timestamp), tz))
    }

  /** O-11: epoch-millis derivation. Semantics ledger (SURVEY §7.3): the
    * reference computes int64(ns)/1e6 = a FLOAT in practice while declaring
    * INT64; we store the declared LongType (truncating division). */
  def withUnixMillis(df: DataFrame): DataFrame =
    df.withColumn(UnixTimestampInMillis, unix_millis(col(Timestamp)))
}

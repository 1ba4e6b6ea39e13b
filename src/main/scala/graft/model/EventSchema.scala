package graft.model

import org.apache.spark.sql.types._

/** The engine's table model: fixed base schemas shared by all event tables,
  * per-table extensions, non-null sets, timestamp fields and the allowlist
  * prefixes for the shared tracks table.
  *
  * Behavioral spec from the reference:
  *  - base structure: seghouse/config/default_table_structure.py:3-14
  *  - tracks extras (original_event, event): ibid:16-19
  *  - users extras (user_id, ver): ibid:37-38
  *  - allowlist prefixes: ibid:23-28
  *  - reserved default table names: ibid:44-62
  *  - timestamp fields: seghouse/config/event_fields.py:1-7
  *
  * Type-system mapping (reference seghouse/config/data_type.py:5-25 ->
  * Spark): STRING->StringType, INT64->LongType, FLOAT64->DoubleType,
  * BOOLEAN->BooleanType, DATETIME->TimestampType, DATE->DateType,
  * narrow ints->Byte/Short/Integer, FLOAT32->FloatType, 128/256-bit ints ->
  * DecimalType(38,0) (documented narrowing), UUID->StringType,
  * ARRAY->ArrayType (the reference flattens arrays away; we keep the type
  * available for sources that skip flattening).
  */
object EventSchema {

  val MessageId             = "message_id"
  val ReceivedAt            = "received_at"
  val SentAt                = "sent_at"
  val Timestamp             = "timestamp"
  val UnixTimestampInMillis = "unix_timestamp_in_millis"
  val UserId                = "user_id"
  val Ver                   = "ver"
  val EventCol              = "event"
  val OriginalEventCol      = "original_event"
  val TypeCol               = "type"

  /** received_at / sent_at / timestamp parsed to TimestampType on ingest. */
  val TimestampFields: Seq[String] = Seq(ReceivedAt, SentAt, Timestamp)

  /** Shared base schema: every event table starts from these columns. */
  val BaseStructure: Seq[StructField] = Seq(
    StructField(MessageId, StringType),
    StructField("anonymous_id", StringType),
    StructField(ReceivedAt, TimestampType),
    StructField(Timestamp, TimestampType),
    StructField(UnixTimestampInMillis, LongType),
    StructField("ip", StringType),
    StructField("channel", StringType),
    StructField(UserId, StringType),
    StructField("write_key", StringType),
    StructField(TypeCol, StringType)
  )

  val TracksExtra: Seq[StructField] = Seq(
    StructField(OriginalEventCol, StringType),
    StructField(EventCol, StringType)
  )

  val UsersExtra: Seq[StructField] = Seq(
    StructField(UserId, StringType),
    StructField(Ver, LongType)
  )

  def base: StructType   = StructType(BaseStructure)
  def tracks: StructType = StructType(BaseStructure ++ TracksExtra)
  def users: StructType = StructType(
    (BaseStructure.filterNot(f => UsersExtra.exists(_.name == f.name)) ++ UsersExtra)
  )

  /** Columns that must be non-null in every event table (plus any configured
    * extra-timestamp columns, added at job-config time). */
  val NonNullColumns: Seq[String] = Seq(ReceivedAt, Timestamp, MessageId)

  /** users additionally requires these non-null. */
  val UsersNonNull: Seq[String] = Seq(Ver, UserId)

  /** Allowlist prefixes for the shared tracks table projection (O-7). */
  val TracksAllowedFieldPrefixes: Seq[String] = Seq("context_", "traits_", "geoip_", "e_")

  val TracksTable     = "tracks"
  val ScreensTable    = "screens"
  val IdentitiesTable = "identities"
  val PagesTable      = "pages"
  val UsersTable      = "users"
  val AliasesTable    = "aliases"
  val GroupsTable     = "groups"
  val MisfitsTable    = "misfits"

  /** Reserved names: a track event whose normalized name collides with one of
    * these gets an `esc_` table-name prefix (O-33). */
  val DefaultTables: Seq[String] = Seq(
    TracksTable, ScreensTable, IdentitiesTable, PagesTable,
    UsersTable, AliasesTable, GroupsTable, MisfitsTable
  )

  /** The six event-type discriminator values; anything else is dropped (O-12). */
  val EventTypes: Seq[String] = Seq("track", "identify", "page", "screen", "group", "alias")

  /** type value -> destination stream name. */
  val TypeToStream: Map[String, String] = Map(
    "track"    -> TracksTable,
    "identify" -> IdentitiesTable,
    "page"     -> PagesTable,
    "screen"   -> ScreensTable,
    "group"    -> GroupsTable,
    "alias"    -> AliasesTable
  )

  /** Misfit (dead-letter) record schema: full provenance for one quarantined
    * cell (reference dataframe_util.py:99-145 + clickhouse.py:222-233). */
  val MisfitSchema: StructType = StructType(Seq(
    StructField(MessageId, StringType),
    StructField("table_name", StringType),
    StructField("column_name", StringType),
    StructField("column_value", StringType),
    StructField("expected_data_type", StringType),
    StructField("actual_data_type", StringType)
  ))
}

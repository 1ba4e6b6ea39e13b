package graft.sink

import org.apache.spark.sql.types._

import graft.model.EventSchema._

/** ClickHouse DDL generation — the exact statement surface the reference
  * drives (seghouse/warehouse/clickhouse.py):
  *
  *  - create_schema            :59-66   CREATE DATABASE IF NOT EXISTS
  *  - create_table             :69-93   Nullable-wrapped columns,
  *    ReplacingMergeTree(), PARTITION BY toDate(timestamp),
  *    ORDER BY (timestamp, message_id)
  *  - create_users_table       :95-123  ReplacingMergeTree(ver),
  *    ORDER BY (user_id), no partition
  *  - misfits table            :222-233 ReplacingMergeTree(),
  *    ORDER BY (message_id, table_name, column_name)
  *  - add_column               :185-191 ALTER TABLE ... ADD COLUMN IF NOT EXISTS
  *  - describe                 :137-144 DESCRIBE TABLE
  *
  * Type mapping mirrors seghouse_type_to_ch_type (clickhouse.py:16-32);
  * the generator is pure (string out), so it is fully unit-testable with
  * no ClickHouse in the environment, and `ClickHouseWarehouse` wires it
  * into the JDBC sink for a live deployment.
  */
object ClickHouseDdl {

  /** Spark type -> ClickHouse type (clickhouse.py:16-32 equivalences). */
  def chType(dt: DataType): String = dt match {
    case StringType     => "String"
    case LongType       => "Int64"
    case IntegerType    => "Int32"
    case ShortType      => "Int16"
    case ByteType       => "Int8"
    case DoubleType     => "Float64"
    case FloatType      => "Float32"
    case BooleanType    => "UInt8"   // CH boolean convention (clickhouse.py:29)
    case TimestampType  => "DateTime"
    case DateType       => "Date"
    case d: DecimalType => s"Decimal(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"no ClickHouse mapping for ${other.simpleString}")
  }

  /** Backtick-quote an identifier, escaping embedded backslashes and
    * backticks. JSON-derived keys are only cleaned of spaces/':'/'-'
    * upstream (Names.cleanEventKey), so anything else a key carries would
    * otherwise yield invalid or injectable DDL — the reference has the
    * same f-string flaw (clickhouse.py:69-93); the JDBC sibling quotes,
    * and this dialect now does too. */
  def q(ident: String): String =
    "`" + ident.replace("\\", "\\\\").replace("`", "\\`") + "`"

  private def columnSql(f: StructField, nonNull: Set[String]): String = {
    val t = chType(f.dataType)
    // every column Nullable except the non-null set (clickhouse.py:78-80,125-134)
    if (nonNull(f.name)) s"${q(f.name)} $t" else s"${q(f.name)} Nullable($t)"
  }

  def createDatabase(schema: String): String =
    s"CREATE DATABASE IF NOT EXISTS ${q(schema)}"

  /** Event-table DDL: dedup + layout exactly as the reference delegates to
    * MergeTree (O-22/O-24/O-25). */
  def createTable(schema: String, table: String, cols: StructType,
      nonNullColumns: Seq[String]): String = {
    val body = cols.fields.map(columnSql(_, nonNullColumns.toSet)).mkString(", ")
    s"CREATE TABLE IF NOT EXISTS ${q(schema)}.${q(table)} ($body) " +
      "ENGINE = ReplacingMergeTree() " +
      s"PARTITION BY toDate(${q(Timestamp)}) " +
      s"ORDER BY (${q(Timestamp)}, ${q(MessageId)})"
  }

  /** Users-table DDL: last-write-wins by ver (O-21/O-28). */
  def createUsersTable(schema: String, cols: StructType,
      nonNullColumns: Seq[String]): String = {
    val nn = (nonNullColumns ++ UsersNonNull).toSet
    val body = cols.fields.map(columnSql(_, nn)).mkString(", ")
    s"CREATE TABLE IF NOT EXISTS ${q(schema)}.${q(UsersTable)} ($body) " +
      s"ENGINE = ReplacingMergeTree(${q(Ver)}) " +
      s"ORDER BY (${q(UserId)})"
  }

  /** Misfits-table DDL (O-23/O-32). */
  def createMisfitsTable(schema: String): String = {
    val body = MisfitSchema.fields
      .map(f => s"${q(f.name)} Nullable(${chType(f.dataType)})").mkString(", ")
    s"CREATE TABLE IF NOT EXISTS ${q(schema)}.${q(MisfitsTable)} ($body) " +
      "ENGINE = ReplacingMergeTree() " +
      s"ORDER BY (${q(MessageId)}, ${q("table_name")}, ${q("column_name")})"
  }

  /** Append-only evolution (O-30). New columns are always Nullable. */
  def addColumn(schema: String, table: String, f: StructField): String =
    s"ALTER TABLE ${q(schema)}.${q(table)} ADD COLUMN IF NOT EXISTS ${q(f.name)} Nullable(${chType(f.dataType)})"

  def describeTable(schema: String, table: String): String =
    s"DESCRIBE TABLE ${q(schema)}.${q(table)}"

  /** CH type string -> Spark type (read-back, clickhouse.py:146-183).
    * Mirrors the reference's substring matching, including the documented
    * quirk that booleans stored as UInt8 read back as integers. */
  def sparkType(ch: String): DataType = {
    val base = ch.stripPrefix("Nullable(").stripSuffix(")")
    base match {
      case "String"   => StringType
      case "Int8"     => ByteType
      case "Int16"    => ShortType
      case "Int32"    => IntegerType
      case "Int64"    => LongType
      case "UInt8" | "UInt16" => IntegerType  // boolean quirk: UInt8 -> int
      case "UInt32" | "UInt64" => LongType
      case "Int128" | "Int256" | "UInt256" => DecimalType(38, 0) // documented narrowing
      case "Float32"  => FloatType
      case "Float64"  => DoubleType
      case "Date"     => DateType
      case "DateTime" => TimestampType
      case d if d.startsWith("Decimal(") =>
        val Array(p, s) = d.stripPrefix("Decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
        DecimalType(p, s)
      case other => throw new IllegalArgumentException(s"unmapped ClickHouse type $other")
    }
  }
}

/** JDBC warehouse speaking ClickHouse DDL. Data path identical to the
  * Derby-tested base; only the statements differ. Live validation requires
  * a ClickHouse JDBC driver + server (not present in this environment —
  * the DDL strings themselves are unit-tested against the reference's
  * statement shapes). */
final class ClickHouseWarehouse(url: String, extraProps: Map[String, String] = Map.empty)
    extends JdbcWarehouse(url, extraProps) {
  override protected def typeSql(dt: DataType): String =
    s"Nullable(${ClickHouseDdl.chType(dt)})"
}

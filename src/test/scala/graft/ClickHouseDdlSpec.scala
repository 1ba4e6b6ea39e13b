package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.model.EventSchema
import graft.sink.ClickHouseDdl

class ClickHouseDdlSpec extends AnyFunSuite {

  test("event-table DDL matches the reference's MergeTree clauses") {
    val sql = ClickHouseDdl.createTable("ns", "tracks",
      StructType(Seq(
        StructField("message_id", StringType),
        StructField("timestamp", TimestampType),
        StructField("n", LongType))),
      nonNullColumns = Seq("message_id", "timestamp"))
    assert(sql ==
      "CREATE TABLE IF NOT EXISTS `ns`.`tracks` (" +
        "`message_id` String, `timestamp` DateTime, `n` Nullable(Int64)) " +
        "ENGINE = ReplacingMergeTree() " +
        "PARTITION BY toDate(`timestamp`) " +
        "ORDER BY (`timestamp`, `message_id`)")
  }

  test("identifiers are backtick-quoted with embedded specials escaped") {
    val sql = ClickHouseDdl.createTable("ns", "t",
      StructType(Seq(
        StructField("message_id", StringType),
        StructField("timestamp", TimestampType),
        StructField("weird`col", StringType),
        StructField("back\\slash", StringType))),
      nonNullColumns = Seq("message_id", "timestamp"))
    assert(sql.contains("`weird\\`col` Nullable(String)"))
    assert(sql.contains("`back\\\\slash` Nullable(String)"))
  }

  test("users-table DDL uses ReplacingMergeTree(ver) ORDER BY user_id") {
    val sql = ClickHouseDdl.createUsersTable("ns",
      StructType(Seq(
        StructField("user_id", StringType),
        StructField("ver", LongType),
        StructField("email", StringType))),
      nonNullColumns = Seq("timestamp", "message_id"))
    assert(sql.contains("ENGINE = ReplacingMergeTree(`ver`)"))
    assert(sql.contains("ORDER BY (`user_id`)"))
    assert(sql.contains("`user_id` String"))   // non-null via UsersNonNull
    assert(sql.contains("`ver` Int64"))
    assert(sql.contains("`email` Nullable(String)"))
    assert(!sql.contains("PARTITION BY"))
  }

  test("misfits-table DDL orders by the misfit identity") {
    val sql = ClickHouseDdl.createMisfitsTable("ns")
    assert(sql.contains("ORDER BY (`message_id`, `table_name`, `column_name`)"))
    assert(sql.contains("ENGINE = ReplacingMergeTree()"))
  }

  test("add-column is IF NOT EXISTS and Nullable") {
    assert(ClickHouseDdl.addColumn("ns", "t", StructField("x", DoubleType)) ==
      "ALTER TABLE `ns`.`t` ADD COLUMN IF NOT EXISTS `x` Nullable(Float64)")
  }

  test("type mapping round-trips with the documented quirks") {
    assert(ClickHouseDdl.chType(BooleanType) == "UInt8")
    // boolean read-back quirk: UInt8 comes back as integer (SURVEY §1.3)
    assert(ClickHouseDdl.sparkType("UInt8") == IntegerType)
    assert(ClickHouseDdl.sparkType("Nullable(Int64)") == LongType)
    assert(ClickHouseDdl.sparkType("Int256") == DecimalType(38, 0))
    assert(ClickHouseDdl.sparkType("Decimal(12,2)") == DecimalType(12, 2))
  }

  test("misfit schema fields are exactly the reference's provenance columns") {
    assert(EventSchema.MisfitSchema.fieldNames.toSeq ==
      Seq("message_id", "table_name", "column_name", "column_value",
        "expected_data_type", "actual_data_type"))
  }
}

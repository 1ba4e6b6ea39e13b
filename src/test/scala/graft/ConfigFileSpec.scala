package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.app.{ConfigFile, MiniYaml}
import graft.sink.{ClickHouseDdl, ClickHouseWarehouse, JdbcWarehouse, WarehouseFactory, WarehouseSink}

/** Config-file surface (reference seghouse/config/configuration.py:32-45 +
  * warehouse/factory.py:4-13): YAML-subset parsing, AppConfig extraction,
  * typed warehouse dispatch, and the cluster DDL behavior
  * (clickhouse.py:62-63,74-75). */
class ConfigFileSpec extends AnyFunSuite {

  private val referenceShaped =
    """# seghouse-style config
      |apps:
      |  - write_key: wk1
      |    name: MyApp
      |  - write_key: wk1          # duplicate -> set-dedup (configuration.py:36-38)
      |    name: MyApp
      |  - write_key: wk2
      |    name: otherApp
      |warehouses:
      |  - type: clickhouse
      |    host: ch.example.com
      |    port: 8123
      |    user: default
      |    password: "p#ss"        # '#' inside quotes is not a comment
      |  - type: parquet
      |    root: /tmp/wh
      |skip_fields:
      |  - context_library_version
      |  - 'context_library_name'
      |extra_timestamps:
      |  timestamp_ist: Asia/Kolkata
      |  timestamp_ny: America/New_York
      |""".stripMargin

  test("reference-shaped YAML parses into AppConfig") {
    val c = ConfigFile.fromYamlString(referenceShaped)
    assert(c.apps == Seq(
      ConfigFile.AppEntry("wk1", "MyApp"), ConfigFile.AppEntry("wk2", "otherApp")))
    assert(c.apps.head.schema == "my_app") // App.schema() decamelize
    assert(c.warehouses == Seq(
      Map("type" -> "clickhouse", "host" -> "ch.example.com", "port" -> "8123",
        "user" -> "default", "password" -> "p#ss"),
      Map("type" -> "parquet", "root" -> "/tmp/wh")))
    assert(c.skipFields == Seq("context_library_version", "context_library_name"))
    assert(c.extraTimestamps == Map(
      "timestamp_ist" -> "Asia/Kolkata", "timestamp_ny" -> "America/New_York"))
  }

  test("missing sections default to empty, like the reference's .get reads") {
    val c = ConfigFile.fromYamlString("warehouses:\n  - type: parquet\n    root: /x\n")
    assert(c.apps.isEmpty && c.skipFields.isEmpty && c.extraTimestamps.isEmpty)
    assert(c.warehouses.size == 1)
  }

  test("MiniYaml rejects what it cannot faithfully read") {
    intercept[IllegalArgumentException](MiniYaml.parse("a: [1, 2]"))       // flow seq
    intercept[IllegalArgumentException](MiniYaml.parse("a: {b: 1}"))       // flow map
    intercept[IllegalArgumentException](MiniYaml.parse("a: |\n  text"))    // block scalar
    intercept[IllegalArgumentException](MiniYaml.parse("\ta: 1"))          // tab indent
    intercept[IllegalArgumentException](MiniYaml.parse("a: 1\na: 2"))      // dup key
    intercept[IllegalArgumentException](ConfigFile.fromYamlString("- just\n- a list"))
    // tabs are only illegal in INDENTATION — quoted scalars may carry them
    assert(MiniYaml.parse("a: \"x\ty\"").asInstanceOf[MiniYaml.YMap]
      .entries("a") == MiniYaml.YStr("x\ty"))
  }

  test("block sequences at the same indent as their key (common emitter style)") {
    val c = ConfigFile.fromYamlString(
      """skip_fields:
        |- context_ip
        |- channel
        |warehouses:
        |- type: parquet
        |  root: /x
        |- type: jdbc
        |  url: jdbc:derby:y
        |extra_timestamps:
        |  t_ny: America/New_York
        |""".stripMargin)
    assert(c.skipFields == Seq("context_ip", "channel"))
    assert(c.warehouses == Seq(
      Map("type" -> "parquet", "root" -> "/x"),
      Map("type" -> "jdbc", "url" -> "jdbc:derby:y")))
    assert(c.extraTimestamps == Map("t_ny" -> "America/New_York"))
  }

  test("nested mapping under a list item nests instead of flattening") {
    val n = MiniYaml.parse(
      """servers:
        |  - name: a
        |    opts:
        |      retries: 3
        |      mode: fast
        |  - name: b
        |""".stripMargin).asInstanceOf[MiniYaml.YMap]
    val items = n.entries("servers").asInstanceOf[MiniYaml.YSeq].items
    val first = items.head.asInstanceOf[MiniYaml.YMap].entries
    assert(first("name") == MiniYaml.YStr("a"))
    assert(first("opts") == MiniYaml.YMap(scala.collection.immutable.ListMap(
      "retries" -> MiniYaml.YStr("3"), "mode" -> MiniYaml.YStr("fast"))))
    assert(items(1).asInstanceOf[MiniYaml.YMap].entries("name") == MiniYaml.YStr("b"))
  }

  test("quoting, comments, and empty values") {
    val n = MiniYaml.parse(
      "a: \"x # not a comment\"  # real comment\nb: 'it''s'\nc:\n").asInstanceOf[MiniYaml.YMap]
    assert(n.entries("a") == MiniYaml.YStr("x # not a comment"))
    assert(n.entries("b") == MiniYaml.YStr("it's"))
    assert(n.entries("c") == MiniYaml.YStr(""))
  }

  test("factory dispatch mirrors factory.py") {
    assert(WarehouseFactory.fromConf(Map("type" -> "parquet", "root" -> "/tmp/x"))
      .isInstanceOf[WarehouseSink])
    val j = WarehouseFactory.fromConf(Map("type" -> "jdbc", "url" -> "jdbc:derby:memory:cfg"))
    assert(j.isInstanceOf[JdbcWarehouse] && !j.isInstanceOf[ClickHouseWarehouse])
    assert(WarehouseFactory.fromConf(Map(
      "type" -> "clickhouse", "host" -> "h", "user" -> "u", "password" -> ""))
      .isInstanceOf[ClickHouseWarehouse])
    val e = intercept[IllegalArgumentException](
      WarehouseFactory.fromConf(Map("type" -> "snowflake")))
    assert(e.getMessage.contains("Unable to get warehouse of type")) // factory.py:8
    intercept[IllegalArgumentException](
      WarehouseFactory.fromConf(Map("type" -> "clickhouse", "host" -> "h"))) // missing user
  }

  test("cluster: ON CLUSTER on create-database, refusal on table DDL") {
    assert(ClickHouseDdl.createDatabase("db", Some("main"))
      == "CREATE DATABASE IF NOT EXISTS `db` ON CLUSTER `main`")
    assert(ClickHouseDdl.createDatabase("db") == "CREATE DATABASE IF NOT EXISTS `db`")
    // clickhouse.py:74-75: table DDL with a cluster raises
    val wh = new ClickHouseWarehouse("jdbc:clickhouse://h:9000", Map.empty, Some("main")) {
      def tableDdl(): String = createTableSql("db", "tracks",
        org.apache.spark.sql.types.StructType(Nil))
    }
    intercept[UnsupportedOperationException](wh.tableDdl())
  }
}

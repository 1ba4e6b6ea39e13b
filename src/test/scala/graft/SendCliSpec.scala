package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.app.SendCli
import graft.sink.TableCatalog

class SendCliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("argument parsing: full flag set") {
    val a = SendCli.parse(Seq(
      "--source-dir", "/in", "--namespace", "MyApp",
      "--warehouse-root", "/wh1", "--warehouse-root", "/wh2",
      "--jdbc-url", "jdbc:derby:x",
      "--skip-field", "secret", "--extra-timestamp", "ny=America/New_York"))
    assert(a.warehouseRoots == Seq("/wh1", "/wh2"))
    assert(a.jdbcUrls == Seq("jdbc:derby:x"))
    assert(a.extraTimestamps == Map("ny" -> "America/New_York"))
  }

  test("argument parsing: errors on bad input") {
    intercept[IllegalArgumentException](SendCli.parse(Seq("--source-dir", "/in")))
    intercept[IllegalArgumentException](SendCli.parse(Seq("--bogus", "x")))
    intercept[IllegalArgumentException](SendCli.parse(Seq(
      "--source-dir", "/in", "--namespace", "n", "--warehouse-root", "/w",
      "--extra-timestamp", "missing_equals")))
    intercept[IllegalArgumentException](SendCli.parse(Seq(
      "--source-dir", "/in", "--namespace", "n", "--warehouse-root", "/w", "--stream")))
  }

  test("batch run end-to-end through the CLI surface") {
    val src = Files.createTempDirectory("graft_cli_src")
    val wh  = Files.createTempDirectory("graft_cli_wh")
    Files.write(src.resolve("b.json"),
      (s"""{"messageId":"c1","anonymousId":"a","userId":"u1","type":"track","event":"Cli Test",""" +
        s""""timestamp":"2024-01-01T00:00:01.000Z","receivedAt":"2024-01-01T00:00:02.000Z",""" +
        s""""sentAt":"2024-01-01T00:00:01.000Z","ip":"1.1.1.1","channel":"web","writeKey":"wk"}""")
        .getBytes(StandardCharsets.UTF_8))
    SendCli.run(spark, SendCli.parse(Seq(
      "--source-dir", src.toString, "--namespace", "CliNs",
      "--warehouse-root", wh.toString)))
    val cat = new TableCatalog(wh.toString)
    assert(cat.read(spark, "cli_ns", "tracks").count() == 1)
    assert(cat.read(spark, "cli_ns", "cli_test").count() == 1)
  }

  test("config-file run: file supplies warehouse + skip_fields, flags merge") {
    val src = Files.createTempDirectory("graft_cfg_src")
    val wh  = Files.createTempDirectory("graft_cfg_wh")
    Files.write(src.resolve("b.json"),
      (s"""{"messageId":"c2","anonymousId":"a","userId":"u1","type":"track","event":"Cfg Test",""" +
        s""""timestamp":"2024-01-01T00:00:01.000Z","receivedAt":"2024-01-01T00:00:02.000Z",""" +
        s""""sentAt":"2024-01-01T00:00:01.000Z","ip":"1.1.1.1","channel":"web","writeKey":"wk"}""")
        .getBytes(StandardCharsets.UTF_8))
    val cfg = Files.createTempFile("graft_cfg", ".yaml")
    Files.write(cfg,
      s"""apps:
         |  - write_key: wk
         |    name: CfgNs
         |warehouses:
         |  - type: parquet
         |    root: $wh
         |skip_fields:
         |  - channel
         |extra_timestamps:
         |  timestamp_ist: Asia/Kolkata
         |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val a = SendCli.parse(Seq(
      "--source-dir", src.toString, "--namespace", "CfgNs",
      "--config-file", cfg.toString, "--skip-field", "ip"))
    val conf = SendCli.toConf(a)
    assert(conf.skipFields == Seq("channel", "ip")) // file first, flags appended
    assert(conf.extraTimestamps == Map("timestamp_ist" -> "Asia/Kolkata"))
    assert(conf.warehouseConfs == Seq(Map("type" -> "parquet", "root" -> wh.toString)))
    SendCli.run(spark, a)
    val cat = new TableCatalog(wh.toString)
    val tracks = cat.read(spark, "cfg_ns", "tracks")
    assert(tracks.count() == 1)
    val cols = tracks.columns.toSet
    assert(!cols.contains("channel") && !cols.contains("ip")) // both skip sources applied
    assert(cols.contains("timestamp_ist")) // file extra timestamp applied
  }

  test("config file alone satisfies the warehouse requirement; empty one does not") {
    intercept[IllegalArgumentException](SendCli.parse(Seq(
      "--source-dir", "/in", "--namespace", "n"))) // no sink source at all
    val empty = Files.createTempFile("graft_cfg_empty", ".yaml")
    Files.write(empty, "skip_fields:\n  - x\n".getBytes(StandardCharsets.UTF_8))
    val a = SendCli.parse(Seq(
      "--source-dir", "/in", "--namespace", "n", "--config-file", empty.toString))
    intercept[IllegalArgumentException](SendCli.toConf(a)) // file has no warehouses
  }
}

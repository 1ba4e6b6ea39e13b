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
}

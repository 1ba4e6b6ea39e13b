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

  test("batch run at the reference's operating envelope: 120 gzipped NDJSON files") {
    // The reference CLI's documented contract is a directory of ~100s of
    // gzipped Segment batch files (seghouse/app.py:21-30 fetches a day's
    // S3 prefix and hands the whole listing to one batch run). This
    // drives the FULL pipeline — multi-file gz read, type split,
    // event-name normalization + fan-out, (ts, messageId) dedup,
    // users last-write-wins — through the CLI surface at that shape,
    // with every expected table count computed from the generator.
    import java.util.zip.GZIPOutputStream
    val src = Files.createTempDirectory("graft_cli_gz_src")
    val wh  = Files.createTempDirectory("graft_cli_gz_wh")
    val files = 120
    val perFile = 50
    def line(n: Int): String = {
      val ts = f"2024-01-01T${n / 3600}%02d:${n / 60 % 60}%02d:${n % 60}%02d.000Z"
      val common =
        s""""messageId":"m$n","anonymousId":"a${n % 13}","userId":"u${n % 7}",""" +
          s""""timestamp":"$ts","receivedAt":"$ts","sentAt":"$ts",""" +
          s""""ip":"1.1.1.$n","channel":"web","writeKey":"wk""""
      n % 10 match {
        case k if k <= 5 =>
          val ev = if (n % 2 == 0) "Add To Cart" else "checkout_started"
          s"""{"type":"track","event":"$ev",$common}"""
        case 6 => s"""{"type":"identify","traits":{"plan":"p${n % 3}"},$common}"""
        case 7 => s"""{"type":"page","name":"Home",$common}"""
        case 8 => s"""{"type":"screen","name":"Main",$common}"""
        case _ => s"""{"type":"identify","traits":{"plan":"p${n % 3}"},$common}"""
      }
    }
    (0 until files).foreach { f =>
      val out = new GZIPOutputStream(
        Files.newOutputStream(src.resolve(f"part-$f%03d.json.gz")))
      val body = (0 until perFile).map { i =>
        val n = f * perFile + i
        // every 100th line is an exact duplicate of its predecessor
        // (same messageId AND ts — the O-22 dedup key), crossing a file
        // boundary whenever n % 100 == 99 lands on i == 49
        if (n % 100 == 99) line(n - 1) else line(n)
      }.mkString("", "\n", "\n")
      out.write(body.getBytes(StandardCharsets.UTF_8))
      out.close()
    }
    SendCli.run(spark, SendCli.parse(Seq(
      "--source-dir", src.toString, "--namespace", "BigNs",
      "--warehouse-root", wh.toString)))
    val cat = new TableCatalog(wh.toString)
    def n(table: String) = cat.read(spark, "big_ns", table).count()
    val total = files * perFile // 6000; n % 100 == 99 slots (60) hold dups
    assert(n("tracks") == total * 6 / 10)            // types 0-5: 3600
    assert(n("add_to_cart") == total * 3 / 10)       // even track lines: 1800
    assert(n("checkout_started") == total * 3 / 10)  // odd track lines: 1800
    assert(n("pages") == total / 10)                 // type 7: 600
    // screens: the TABLE holds the raw 600 + 60 duplicate rows — the
    // reference's insert path does NOT dedup (ReplacingMergeTree
    // collapses at merge/read time, clickhouse.py:81-88), and neither
    // does ours; the read-side FINAL is Dedup.dedupEvents, which
    // collapses the 60 cross-file (ts, messageId) duplicates exactly
    assert(n("screens") == total / 10 + 60)
    assert(graft.etl.Dedup.dedupEvents(
      cat.read(spark, "big_ns", "screens")).count() == total / 10)
    // identities: slots 6 and 9 = 1200, minus the 60 slot-9 lines that
    // were replaced by duplicates of their screen predecessors
    assert(n("identities") == total * 2 / 10 - 60)
    // users: last-write-wins collapses to the 7 distinct userIds
    assert(n("users") == 7)
    // schema spot checks: normalized event column + epoch-millis column
    val tracks = cat.read(spark, "big_ns", "tracks")
    assert(tracks.columns.contains("event_text") || tracks.columns.contains("event"))
    assert(cat.read(spark, "big_ns", "add_to_cart").count() > 0)
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

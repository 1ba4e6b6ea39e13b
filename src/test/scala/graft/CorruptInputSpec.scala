package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.{JobConf, SendToWarehouseJob}
import graft.sink.TableCatalog

/** Malformed-input behavior. Semantics ledger: the reference CRASHES on a
  * malformed NDJSON line (json.loads raises mid-file); we read PERMISSIVE
  * and drop corrupt records — a deliberate, documented improvement (the
  * 100 TB framing makes fail-the-batch-on-one-bad-line untenable). */
class CorruptInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("corrupt NDJSON lines are dropped, valid rows still land") {
    val src = Files.createTempDirectory("graft_corrupt")
    val wh  = Files.createTempDirectory("graft_corrupt_wh")
    val good =
      s"""{"messageId":"g1","anonymousId":"a","userId":"u1","type":"track","event":"Ok Event",""" +
        s""""timestamp":"2024-01-01T00:00:01.000Z","receivedAt":"2024-01-01T00:00:02.000Z",""" +
        s""""sentAt":"2024-01-01T00:00:01.000Z","ip":"1.1.1.1","channel":"web","writeKey":"wk"}"""
    Files.write(src.resolve("mixed.json"), Seq(
      good,
      """{"messageId": "broken", unquoted garbage here!!""",
      "not json at all",
      good.replace("g1", "g2")
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))

    val job = new SendToWarehouseJob(spark,
      JobConf(warehouseRoots = Seq(wh.toString)), "corrupt_ns")
    job.execute(src.toString)

    val tracks = new TableCatalog(wh.toString).read(spark, "corrupt_ns", "tracks")
    assert(tracks.count() == 2)
    val ids = tracks.select("message_id").collect().map(_.getString(0)).toSet
    assert(ids == Set("g1", "g2"))
  }
}

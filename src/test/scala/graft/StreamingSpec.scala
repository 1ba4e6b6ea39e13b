package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.JobConf
import graft.sink.TableCatalog
import graft.streaming.StreamingSend

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming variant ingests a directory with AvailableNow and dedups re-delivery") {
    val src = Files.createTempDirectory("graft_stream_src")
    val wh  = Files.createTempDirectory("graft_stream_wh")
    val ckp = Files.createTempDirectory("graft_stream_ckp")

    def line(id: String, ts: String) =
      s"""{"messageId":"$id","anonymousId":"a","userId":"u1","type":"track","event":"Ping",""" +
        s""""timestamp":"$ts","receivedAt":"$ts","sentAt":"$ts","ip":"1.2.3.4","channel":"web","writeKey":"wk"}"""

    // duplicate messageId within the stream -> dropDuplicatesWithinWatermark
    Files.write(src.resolve("s1.json"), Seq(
      line("s-1", "2024-01-01T00:00:00.000Z"),
      line("s-1", "2024-01-01T00:00:00.000Z"),
      line("s-2", "2024-01-01T00:01:00.000Z")
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))

    // infer the NDJSON schema from the static reader (streaming requires one)
    val schema = spark.read.json(src.toString).schema
    val q = StreamingSend.start(spark, JobConf(warehouseRoots = Seq(wh.toString)),
      "StreamNs", src.toString, schema, ckp.toString)
    q.awaitTermination(120000)

    val tracks = new TableCatalog(wh.toString).read(spark, "stream_ns", "tracks")
    assert(tracks.count() == 2) // s-1 deduped
    assert(new TableCatalog(wh.toString).read(spark, "stream_ns", "ping").count() == 2)
  }
}

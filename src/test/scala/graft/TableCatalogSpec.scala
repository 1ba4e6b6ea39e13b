package graft

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.RawLocalFileSystem
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.sink.TableCatalog

/** A local filesystem registered under a scheme that has a FileSystem impl
  * but NO AbstractFileSystem binding, so `FileContext.getFileContext`
  * throws UnsupportedFileSystemException — exactly the object-store shape
  * (e.g. a bare s3a binding) that forces TableCatalog's non-atomic
  * schema-swap fallback. */
class NoFcFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "nofc"
  override def getUri: URI = URI.create("nofc:///")
}

class TableCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def nofcRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.nofc.impl", classOf[NoFcFileSystem].getName)
    // no fs.AbstractFileSystem.nofc.impl on purpose
    val dir = Files.createTempDirectory("graft-nofc").toFile
    dir.deleteOnExit()
    "nofc://" + dir.getAbsolutePath
  }

  private val s1 = StructType(Seq(StructField("a", StringType)))
  private val s2 = StructType(Seq(StructField("a", StringType), StructField("b", LongType)))

  test("schema swap works on a scheme without an AbstractFileSystem binding") {
    val cat = new TableCatalog(nofcRoot())
    cat.createDatabase("db")
    // create goes through writeSchema's fallback (no existing file)
    assert(cat.ensureTableStructure("db", "t", s1) == s1)
    assert(cat.tableExists("db", "t"))
    assert(cat.describe("db", "t").contains(s1))
    // evolution replaces the existing schema file via the two-rename swap
    assert(cat.ensureTableStructure("db", "t", s2) == s2)
    assert(cat.describe("db", "t").contains(s2))
    // the parked backup is cleaned up after a successful swap
    val fs = new org.apache.hadoop.fs.Path(cat.root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      cat.tablePath("db", "t") + "/._schema.json.bak")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      cat.tablePath("db", "t") + "/._schema.json.tmp")))
  }

  test("concurrent writers evolving one table never drop another writer's columns") {
    // 8 batches race ensureTableStructure on the SAME (fresh) table, each
    // bringing the base column plus one private column — including the
    // create race (no pre-existing schema), and spread across TWO catalog
    // instances on the same root (Warehouse.parquet constructs a fresh
    // catalog per call, so serialization must be JVM-wide, not
    // per-instance). Whatever the interleaving, the final schema must
    // carry the UNION of all 8 evolutions; an unserialized
    // read-modify-write loses whichever columns landed between a racer's
    // read and its write.
    val root = java.nio.file.Files.createTempDirectory("graft-cat-race").toString
    val cats = Array(new TableCatalog(root), new TableCatalog(root))
    val cat = cats(0)
    cat.createDatabase("db")
    val n = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val start = new java.util.concurrent.CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until n).foreach { i =>
      pool.execute { () =>
        try {
          start.await()
          val mine = StructType(Seq(
            StructField("base", StringType), StructField(s"col_$i", LongType)))
          // each writer's return value must already include its column
          assert(cats(i % 2).ensureTableStructure("db", "race", mine)
            .fieldNames.contains(s"col_$i"))
        } catch { case e: Throwable => failures.add(e) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"writer threw: ${failures.peek()}")
    val finalSchema = cat.describe("db", "race").get.fieldNames.toSet
    val expected = Set("base") ++ (0 until n).map(i => s"col_$i")
    assert(finalSchema == expected,
      s"lost columns: ${expected -- finalSchema}")
  }

  test("a reader racing the fallback swap still sees the table via the backup") {
    val cat = new TableCatalog(nofcRoot())
    cat.createDatabase("db")
    cat.ensureTableStructure("db", "t", s1)
    // simulate the mid-swap window by hand: main file parked as backup,
    // replacement not yet in place
    val fs = new org.apache.hadoop.fs.Path(cat.root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(cat.tablePath("db", "t") + "/_schema.json")
    val bak = new org.apache.hadoop.fs.Path(cat.tablePath("db", "t") + "/._schema.json.bak")
    assert(fs.rename(dst, bak))
    assert(cat.tableExists("db", "t"))           // not "gone" mid-swap
    assert(cat.describe("db", "t").contains(s1)) // old schema still authoritative
    // and a writer landing after the crash evolves from that backup, not
    // from scratch
    assert(cat.ensureTableStructure("db", "t", s2) == s2)
    assert(cat.describe("db", "t").contains(s2))
  }
}

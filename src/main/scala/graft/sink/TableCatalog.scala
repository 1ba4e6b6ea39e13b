package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Append-only schema-evolving table catalog over a parquet directory tree.
  *
  * The reference leans on ClickHouse DDL for all of this: CREATE DATABASE
  * (clickhouse.py:59-66), CREATE TABLE IF NOT EXISTS with a memo set
  * (clickhouse.py:69-93), DESCRIBE TABLE (clickhouse.py:137-144) and
  * ALTER TABLE ADD COLUMN IF NOT EXISTS (clickhouse.py:185-191). Over a
  * Spark-managed lakehouse we own the authoritative schema ourselves
  * (SURVEY §7.3 hard part 1): each table directory carries a
  * `_schema.json` (Spark `StructType.json`), evolution is append-only
  * union-widening (columns are never dropped or retyped — reference
  * send_to_warehouse.py:298-307), and the table schema wins over the batch
  * at insert time (coercion handled by etl.Coerce).
  *
  * All catalog operations are driver-side metadata: no data job is launched
  * by ensure/describe/evolve, matching the "created_tables memo" round-trip
  * avoidance (clickhouse.py:39,71-72).
  */
final class TableCatalog(val root: String) {

  private val createdTables = mutable.Set[String]()

  def databasePath(db: String): String     = s"$root/$db"
  def tablePath(db: String, t: String): String = s"$root/$db/$t"
  private def schemaFile(db: String, t: String) = Paths.get(s"${tablePath(db, t)}/_schema.json")

  /** O-26: CREATE DATABASE IF NOT EXISTS. */
  def createDatabase(db: String): Unit = {
    Files.createDirectories(Paths.get(databasePath(db)))
    ()
  }

  def tableExists(db: String, t: String): Boolean = Files.exists(schemaFile(db, t))

  /** O-29: DESCRIBE TABLE — the authoritative schema, or None. */
  def describe(db: String, t: String): Option[StructType] =
    if (!tableExists(db, t)) None
    else Some(DataType.fromJson(
      new String(Files.readAllBytes(schemaFile(db, t)), StandardCharsets.UTF_8)
    ).asInstanceOf[StructType])

  private def writeSchema(db: String, t: String, s: StructType): Unit = {
    Files.createDirectories(Paths.get(tablePath(db, t)))
    // atomic replace so a concurrent reader never sees a torn schema file
    val tmp = Paths.get(s"${tablePath(db, t)}/._schema.json.tmp")
    Files.write(tmp, s.json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, schemaFile(db, t), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** O-27/O-30: ensure the table exists and contains every column of
    * `batchSchema`; new columns are appended (never retyped/dropped).
    * Returns the post-evolution authoritative schema. Memoized per table
    * name for the no-new-columns fast path. */
  def ensureTableStructure(db: String, t: String, batchSchema: StructType): StructType = {
    val key = s"$db.$t"
    describe(db, t) match {
      case None =>
        writeSchema(db, t, batchSchema)
        createdTables += key
        batchSchema
      case Some(existing) =>
        val known   = existing.fieldNames.toSet
        val newCols = batchSchema.fields.filterNot(f => known(f.name))
        if (newCols.isEmpty) existing
        else {
          val evolved = StructType(existing.fields ++ newCols)
          writeSchema(db, t, evolved)
          evolved
        }
    }
  }

  /** Read a table back; `mergeSchema` covers parts written before the last
    * evolution (older files simply lack the newer columns -> NULL). */
  def read(spark: SparkSession, db: String, t: String): DataFrame = {
    val p = tablePath(db, t)
    val hasData = Files.exists(Paths.get(p)) && {
      val s = Files.list(Paths.get(p))
      try s.anyMatch(f => f.getFileName.toString.endsWith(".parquet") ||
        Files.isDirectory(f) && !f.getFileName.toString.startsWith("_") && !f.getFileName.toString.startsWith("."))
      finally s.close()
    }
    if (!hasData) {
      val schema = describe(db, t).getOrElse(new StructType())
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      spark.read.option("mergeSchema", "true").parquet(p)
    }
  }
}

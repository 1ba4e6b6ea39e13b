package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Cardinality
import graft.sink.SnapshotSink

/** At-scale evidence for the stored-state rollup (q136's deployment
  * claim, the AnnScaleCheck discipline): at gate scale the events table
  * is small enough that "rebuild the day states, then answer" and
  * "answer from the stored states" cost about the same — the
  * amortization only shows when the events scan dominates. This tool
  * builds synthetic events (n rows over `days` integer days, ~n/50
  * distinct users, deterministic hash values — no data files, no
  * randomness), commits the per-day KMV states once, then times:
  *
  *   - RECOMPUTE: per-day sketch build from the events table + the
  *     trailing-window merge (what every query pays without the store);
  *   - SERVE: the trailing-window merge over the STORED state table
  *     (what a query pays with it) — days-sized work, independent of n.
  *
  * Run: `sbt "runMain graft.tools.RollupScaleCheck [nMax] [days]"`.
  * Results are recorded in PLANS.md (scale-evidence section). */
object RollupScaleCheck {

  private def synthetic(spark: SparkSession, n: Long, days: Int): DataFrame =
    spark.range(n).select(
      (col("id") % days).as("d"),
      pmod(xxhash64(col("id")), lit(math.max(n / 50, 10))).as("v"))

  def main(args: Array[String]): Unit = {
    val nMax = args.headOption.map(_.toLong).getOrElse(20000000L)
    val days = args.drop(1).headOption.map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = 256
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    synthetic(spark, 100000, days).agg(sum(col("v"))).collect() // warm-up

    println(s"ROLLUP_SCALE cpus=$cpus k=$k days=$days (trailing-7 distinct rollup)")
    Iterator.iterate((nMax / 100).max(1L))(_ * 10).takeWhile(_ <= nMax).foreach { n =>
      // events land on PARQUET first: a real deployment's recompute pays
      // the storage scan, which in-memory range generation would hide
      val evPath = s"${sys.props("java.io.tmpdir")}/graft_rollup_scale_ev_$n"
      val pfs = new org.apache.hadoop.fs.Path(evPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!pfs.exists(new org.apache.hadoop.fs.Path(evPath)))
        synthetic(spark, n, days).write.mode("overwrite").parquet(evPath)
      val ev = spark.read.parquet(evPath)
      def states() = Cardinality.kmvSketches(ev, "v", "d", k)
        .withColumnRenamed("segment", "day")
      val root = s"${sys.props("java.io.tmpdir")}/graft_rollup_scale_$n"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val (buildSec, _) = time(SnapshotSink.commit(states().coalesce(1), root))
      val (recomputeSec, _) = time(
        Cardinality.trailingDistinctFromStates(states(), k, 7).count())
      val (serveSec, rows) = time(
        Cardinality.trailingDistinctFromStates(
          SnapshotSink.read(spark, root), k, 7).count())
      println(f"  n=$n%10d  state build+commit (once): $buildSec%6.2f s" +
        f"  recompute-per-query: $recomputeSec%6.2f s  serve-from-store: $serveSec%6.2f s" +
        f"  ($rows%d windows)")
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      pfs.delete(new org.apache.hadoop.fs.Path(evPath), true)
    }
    spark.stop()
  }
}

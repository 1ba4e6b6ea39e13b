package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** At-scale evidence for the materialized-ANN-index trade (q44 vs q58).
  *
  * At the driver bench scale (sf0.1 ≈ 2,200 vectors) BOTH knn-join forms
  * are dominated by fixed per-query overhead (scheduling, AQE stages,
  * the rank window), so their times converge and the index looks
  * pointless — the amortization only becomes visible when the
  * corpus-side signature scan is the dominant cost. This tool builds a
  * SYNTHETIC corpus of `n` 64-dim vectors (deterministic per-row hash
  * floats — no data files, no randomness), then times:
  *
  *   - `annJoin`   — re-signs the full corpus EVERY batch;
  *   - `annJoinIndexed` steady-state — corpus signed once at build time
  *     (build excluded from the timing, as in serving), batch re-signs
  *     only the query side.
  *
  * Run: `sbt "runMain graft.tools.AnnScaleCheck [n] [batches]"`.
  * Results are recorded in PLANS.md (the scale-evidence section).
  */
object AnnScaleCheck {

  /** Deterministic pseudo-embedding: element j of row i is derived from
    * xxhash64(i, j) scaled to [-1, 1] — uniform-ish, fully reproducible,
    * computed at scan speed with no data generation step. */
  private def syntheticEmbeddings(spark: SparkSession, n: Long, dim: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(col("id"), j), lit(2000003)).cast("double") / lit(1000001.5)) - 1.0)
        .cast("array<float>").as("embedding"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 64
    val lsh = Similarity.HyperplaneLsh(dim = dim,
      bits = Similarity.recommendedBits(n, targetBucketSize = 500))
    val base = syntheticEmbeddings(spark, n, dim)
    // one query batch = every 1000th vector, ids remapped
    val queries = base.filter(pmod(col("vec_id"), lit(1000)) === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // warm-up (codegen, scheduler)
    base.select(sum(element_at(col("embedding"), 1))).collect()

    val inline = (1 to batches).map { _ =>
      time(Similarity.annJoin(queries, base, "embedding", "vec_id", k = 3, lsh).count())
    }

    val idxPath = s"${sys.props("java.io.tmpdir")}/graft_ann_scale_${n}_${lsh.bits}"
    val (buildSec, _) = time {
      org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
        .delete(new org.apache.hadoop.fs.Path(idxPath), true)
      Similarity.ensureAnnIndex(base, "embedding", "vec_id", lsh, idxPath); 0L
    }
    val indexed = (1 to batches).map { _ =>
      time(Similarity.annJoinIndexed(spark, idxPath, queries, "embedding", "vec_id", k = 3, lsh).count())
    }

    def fmt(xs: Seq[(Double, Long)]) =
      xs.map { case (s, r) => f"$s%.2f s ($r rows)" }.mkString(", ")
    println(s"ANN_SCALE n=$n bits=${lsh.bits} batches=$batches cpus=$cpus")
    println(f"  annJoin (re-sign corpus per batch): ${fmt(inline)}  min=${inline.map(_._1).min}%.2f s")
    println(f"  index build (once): $buildSec%.2f s")
    println(f"  annJoinIndexed (steady state):      ${fmt(indexed)}  min=${indexed.map(_._1).min}%.2f s")
    spark.stop()
  }
}

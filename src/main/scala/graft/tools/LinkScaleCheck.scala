package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.FieldWeight

/** Scale evidence for blocked record linkage (the AnnScaleCheck
  * discipline applied to RecordLinkage).
  *
  * The cost driver of Fellegi–Sunter linkage is CANDIDATE PAIRS:
  * Σ_b |L_b|·|R_b| over blocks. The tool measures the same n×n linkage
  * under three block granularities —
  *
  *   - B = 1 (no blocking): the degenerate cross join, n² pairs; run
  *     only at sizes where the quadratic flood is visible but bounded;
  *   - B = √n-ish and B = n/10: pair count collapses by ~B×, wall
  *     clock follows, per-record cost flattens;
  *
  * — plus a HOT-BLOCK skew case (one block holding 10% of both sides)
  * showing the bound is per-block: total pairs ≈ hot² + cold, i.e. the
  * operator degrades exactly as far as the worst block and no further.
  * The numbers land in PLANS.md (scale-evidence section).
  *
  * Run: `sbt "runMain graft.tools.LinkScaleCheck [nMax]"`. */
object LinkScaleCheck {

  private def side(spark: SparkSession, n: Long, blocks: Long,
      keyName: String, dirty: Boolean): DataFrame = {
    val base = spark.range(n).select(col("id").as(keyName),
      (col("id") % blocks).as("blk"),
      concat(lit("p"), col("id").cast("string")).as("name"),
      concat(lit("s"), (col("id") % 5).cast("string")).as("seg"),
      col("id").cast("double").as("bal"))
    if (!dirty) base
    else base // corrupt one field on a cycle: realistic partial agreement
      .withColumn("name",
        when(col(keyName) % 3 === 0, upper(col("name"))).otherwise(col("name")))
      .withColumn(keyName, col(keyName) + 1000000000L)
  }

  private val weights = Seq(
    FieldWeight("name", 9900L, -3000L),
    FieldWeight("seg", 3000L, -1500L),
    FieldWeight("bal", 5000L, -2000L))

  def main(args: Array[String]): Unit = {
    val nMax = args.headOption.map(_.toLong).getOrElse(300000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    def run(n: Long, blocks: Long, label: String): Unit = {
      val l = side(spark, n, blocks, "lid", dirty = true).localCheckpoint(true)
      val r = side(spark, n, blocks, "rid", dirty = false).localCheckpoint(true)
      val (psec, pairs) = time(l.select("blk").join(r.select("blk"), "blk").count())
      val (lsec, linked) = time(RecordLinkage.linkBest(
        l, "lid", r, "rid", Seq("blk"), weights, 12000L, 0L).count())
      println(f"  $label%-28s n=$n%7d  B=$blocks%6d  cand_pairs=$pairs%12d" +
        f"  ($psec%6.2f s)  linkBest: $linked%7d rows  $lsec%7.2f s")
    }

    side(spark, 1000, 10, "w", dirty = false).agg(count(lit(1))).collect() // warm-up
    println(s"LINK_SCALE cpus=$cpus")
    // no blocking: quadratic — small sizes only
    Seq(3000L, 10000L, 30000L).filter(_ <= nMax).foreach(run(_, 1L, "B=1 (cross join)"))
    // real blocking: pair count collapses, linear-ish growth resumes
    Iterator.iterate(nMax / 100)(_ * 10).takeWhile(_ <= nMax).foreach { n =>
      run(n, math.max(1L, math.round(math.sqrt(n.toDouble))), "B=sqrt(n)")
      run(n, math.max(1L, n / 10), "B=n/10")
    }
    // hot block: 10% of both sides in block 0, rest spread over n/10
    val n = nMax
    val hotL = side(spark, n, n / 10, "lid", dirty = true)
      .withColumn("blk", when(col("lid") % 10 === 0, 0L).otherwise(col("blk")))
      .localCheckpoint(true)
    val hotR = side(spark, n, n / 10, "rid", dirty = false)
      .withColumn("blk", when(col("rid") % 10 === 0, 0L).otherwise(col("blk")))
      .localCheckpoint(true)
    val (psec, pairs) = time(hotL.select("blk").join(hotR.select("blk"), "blk").count())
    val (lsec, linked) = time(RecordLinkage.linkBest(
      hotL, "lid", hotR, "rid", Seq("blk"), weights, 12000L, 0L).count())
    println(f"  hot-block (10%% in one blk)  n=$n%7d  cand_pairs=$pairs%12d" +
      f"  ($psec%6.2f s)  linkBest: $linked%7d rows  $lsec%7.2f s" +
      f"  [expect ≈ (n/10)² + cold]")
    spark.stop()
  }
}

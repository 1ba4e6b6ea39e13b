package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) DATA LAYOUT: interleave the bits of two integer
  * columns so that sorting by the single z-value co-clusters BOTH
  * dimensions — the multi-column file-skipping layout of Delta/Iceberg
  * `OPTIMIZE ZORDER BY`. A file of z-contiguous rows spans a narrow
  * range of x AND a narrow range of y, so a reader with predicates on
  * either (or both) prunes most files from their min/max footer stats,
  * where a plain `ORDER BY x` layout only ever prunes on x.
  *
  * The z-value is the classic magic-number bit spread (Morton 1966; the
  * public-domain "Interleave bits by Binary Magic Numbers" construction):
  * five shift-or-mask steps per coordinate, all `org.apache.spark.sql.
  * functions` bit ops — whole-stage-codegen'd, no UDF, no custom
  * expression needed, and each step replays verbatim in any engine with
  * 64-bit integer `& | <<`.
  *
  * Scale shape: `clusterStats` assigns rows to equal-count z-range
  * "files" via the TWO-PHASE range-partitioned rank (the q165
  * heapsCurve prefix-sum move) — `repartitionByRange` on the total
  * order (z, ties) is the distributed sort, each partition ranks
  * locally under a window PARTITIONED by its physical partition id,
  * and the per-partition row counts (a frame bounded by the partition
  * COUNT, never the data) cumulate into offsets that broadcast back.
  * No data-sized single-partition window anywhere; the rank is
  * deterministic regardless of where the sampled range boundaries
  * fall, because (z, ties) is a total order. The production WRITE path
  * is `df.repartitionByRange(nFiles, zValue(x, y))
  * .sortWithinPartitions(z)` + partitioned write: each partition
  * becomes one file, and the file boundaries come from Spark's range
  * sampling (non-reproducible across runs, which is why the auditable
  * query uses rank buckets instead).
  */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 281470681808895L,    // 0x0000FFFF0000FFFF
    8  -> 71777214294589695L,  // 0x00FF00FF00FF00FF
    4  -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
    2  -> 3689348814741910323L, // 0x3333333333333333
    1  -> 6148914691236517205L) // 0x5555555555555555

  /** Spread the low 32 bits of `v` to the even bit positions (bit i →
    * bit 2i). Input must be in [0, 2^32); callers of [[zValue]] should
    * stay in [0, 2^31) so the interleaved result keeps the sign bit
    * clear. */
  def spreadBits(v: Column): Column =
    Masks.foldLeft(v.bitwiseAND(lit(4294967295L))) { case (c, (s, m)) =>
      c.bitwiseOR(shiftleft(c, s)).bitwiseAND(lit(m))
    }

  /** The Morton z-value of `(x, y)`: x on even bits, y on odd. Both
    * inputs must be non-negative and < 2^31 (a 2^31-or-larger y would
    * reach the sign bit). */
  def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** The same five shift-or-mask steps as ANSI SQL text (for oracles /
    * external engines), over a column expression `v`. */
  def spreadSql(v: String): String =
    Masks.foldLeft(s"($v & 4294967295)") { case (e, (s, m)) =>
      s"(($e | ($e << $s)) & $m)"
    }

  def zValueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Per-"file" layout audit of z-ordering `df` by (x, y) into `nFiles`
    * equal-count z-contiguous files: `(file_id, n_rows, min_x, max_x,
    * min_y, max_y)` — the min/max footer stats a reader would prune on.
    * File assignment is the portable rank bucket `(rank−1)·nFiles / n`
    * over `(z, tieCols…)` (total order ⇒ deterministic, replayable),
    * not range-sampled boundaries. The rank is the two-phase
    * range-partitioned form (see object scaladoc): no single-partition
    * window ever holds the data. Output is nFiles rows. */
  def clusterStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      nFiles: Int,
      tieCols: Seq[String]
  ): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    val z = zValue(col(xCol), col(yCol))
    val ord = col("z").asc +: tieCols.map(col(_).asc)
    val n = df.count() // bounded: one scalar for the bucket arithmetic
    // Phase 1: range-partition on the total order (the ranges ARE the
    // global order), rank locally under a window PARTITIONED by the
    // physical partition id — per-group size is bounded by the range
    // partition, never the table. The checkpoint pins the sampled range
    // boundaries so _pid means the same partition in both phases.
    val local = df
      .select(Seq(col(xCol).as("x"), col(yCol).as("y"), z.as("z")) ++ tieCols.map(col): _*)
      .repartitionByRange(ord: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn",
        row_number().over(Window.partitionBy(col("_pid")).orderBy(ord: _*)))
      .localCheckpoint(true)
    // Phase 2: per-partition counts collapse to one row per partition —
    // a frame bounded by the partition COUNT (O(cluster), not O(data))
    // — cumulate into exclusive prefix offsets and broadcast back.
    val partOff = local.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_pc"))
      .withColumn("_off",
        coalesce(sum(col("_pc")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(partOff), "_pid")
      // global rank = offset + local rank, BIGINT from birth (the r15
      // 100× gate's catch: an INT rank × nFiles passes 2³¹ once the
      // frame exceeds 2³¹/nFiles rows — 6e7 × 64 threw under ANSI).
      // Integer floor division (Divide would go through DOUBLE).
      .withColumn("rn", col("_off") + col("_lrn"))
      .withColumn("file_id", expr(s"(rn - 1) * $nFiles DIV $n"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
  }

  /** Attach the file-skipping verdict for the rectangle predicate
    * `x ∈ [x1,x2] ∧ y ∈ [y1,y2]` to a [[clusterStats]] frame: a file
    * must be scanned iff its [min,max] box intersects the rectangle on
    * BOTH axes — the exact min/max-stats pruning rule. */
  def wouldScan(x1: Long, x2: Long, y1: Long, y2: Long): Column =
    !(col("max_x") < x1 || col("min_x") > x2 ||
      col("max_y") < y1 || col("min_y") > y2)
}

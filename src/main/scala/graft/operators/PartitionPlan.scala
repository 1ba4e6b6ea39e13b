package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PHYSICAL-LAYOUT PLANNERS — the two decisions a 100 TB job gets wrong
  * most expensively, computed as first-class, oracle-replayable queries:
  * where to cut RANGE boundaries for a sort/partition key, and how many
  * SALTS a hot key needs before a shuffle. Spark makes both internally
  * (`repartitionByRange` samples; AQE splits skewed partitions at
  * runtime), but a PIPELINE needs them as durable artifacts: bucketing
  * DDL, writer `partitionBy` grids, and pre-salted join keys are all
  * declared BEFORE a run, from a census of yesterday's data — so the
  * planner itself must be deterministic, integer-exact, and cheap.
  *
  * Both planners collapse the data to a census first and never touch
  * row-grain again — the plan frames are grid-/key-domain-sized.
  */
object PartitionPlan {

  /** Equi-depth RANGE boundaries on a QUANTIZED grid, plus the measured
    * census of the plan they induce.
    *
    * The key is first quantized to `resolution`-wide cells (boundaries
    * only need grid precision — and the grid is what bounds the state:
    * `maxCells` fails LOUDLY if the key span outgrows it, per-row inside
    * the plan, no driver action). Boundary k (k = 1..nRanges-1) is the
    * smallest cell whose cumulative count reaches ceil(k·total/nRanges)
    * — the counting-quantile rank rule (q129/q238) applied to the grid —
    * and a cell belongs to range |{boundaries < cell}|. A single cell
    * heavier than total/nRanges absorbs several boundaries and the plan
    * honestly reports FEWER, fatter ranges instead of pretending balance
    * the grid cannot deliver.
    *
    * Scale shape: one map-side-combined aggregate to the grid; the one
    * cumulative window runs over the grid frame (≤ maxCells rows — the
    * WindowAudit-allowlisted bounded argument); boundaries ride as a
    * 1-row sorted array (≤ nRanges-1 ≤ 256 elements) crossJoined back.
    * Row data is scanned exactly once.
    *
    * Output per NON-EMPTY range: `range_id`, `lo_key`/`hi_key` (the
    * half-open key interval on the original scale), `n_cells`, `n_rows`,
    * `share_pm`, and `balance_pm` (= 10000·n_rows·nRanges / total —
    * 10000 is perfect balance; the max over ranges is the plan's skew
    * headline). Keys must be non-negative longs (floor ≡ DIV). */
  def rangePlan(df: DataFrame, keyCol: String, nRanges: Int,
                resolution: Long, maxCells: Int = 65536): DataFrame = {
    require(nRanges >= 2 && nRanges <= 257, "nRanges in [2,257]")
    require(resolution > 0, "resolution must be positive")
    val grid = df
      .select(when(col(keyCol) < 0, raise_error(concat(
          lit("rangePlan: negative key: "), col(keyCol).cast("string"))))
        .otherwise(expr(s"CAST($keyCol DIV $resolution AS BIGINT)"))
        .as("cell"))
      .filter(col("cell").isNotNull)
      .groupBy("cell").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // consumed by cum, totals, and the census
    val tot = grid.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_cells_total"))
    val cum = grid
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("cell"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(tot)
      .withColumn("cell", when(col("n_cells_total") > maxCells,
          raise_error(concat(lit(s"rangePlan: grid exceeds $maxCells cells: "),
            col("n_cells_total").cast("string"))))
        .otherwise(col("cell")))
    // cum is consumed twice (boundary probe + census) and deliberately
    // NOT checkpointed: recomputing a grid-sized window off the
    // checkpointed grid is free, and keeping the Window node in the
    // returned plan is what lets WindowAudit see and adjudicate it
    // boundary k = min cell with cum >= ceil(k*total/nRanges)
    val ks = df.sparkSession.range(1, nRanges.toLong)
      .select(col("id").as("k"))
    val bnds = cum.join(broadcast(ks),
        col("cum") * nRanges >= col("k") * col("total"))
      .groupBy("k").agg(min(col("cell")).as("b"))
      .agg(sort_array(collect_list(col("b"))).as("bnds"))
    cum.crossJoin(broadcast(bnds))
      .withColumn("range_id",
        size(filter(col("bnds"), b => b < col("cell"))).cast("long"))
      .groupBy("range_id")
      .agg(
        (min(col("cell")) * resolution).as("lo_key"),
        ((max(col("cell")) + 1) * resolution).as("hi_key"),
        count(lit(1)).as("n_cells"),
        sum(col("cnt")).as("n_rows"),
        max(col("total")).as("_total"))
      .withColumn("share_pm",
        expr("CAST(10000 * n_rows DIV _total AS BIGINT)"))
      .withColumn("balance_pm",
        expr(s"CAST(10000 * n_rows * $nRanges DIV _total AS BIGINT)"))
      .drop("_total")
  }

  /** SALT plan for a hot-key shuffle: per key, the row census and the
    * salt count `ceil(n / targetPerTask)` that caps any single
    * (key, salt) task at `targetPerTask` expected rows, with the capped
    * per-task residual `max_task_rows = ceil(n / n_salts)` as the
    * self-check (always ≤ targetPerTask). One map-side-combined
    * aggregate; the emitted plan is key-domain-sized and the hot tail
    * is what the caller keeps (top-k by census). */
  def saltPlan(df: DataFrame, keyCol: String,
               targetPerTask: Long): DataFrame = {
    require(targetPerTask > 0, "targetPerTask must be positive")
    df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .withColumn("n_salts",
        expr(s"CAST((n_rows + $targetPerTask - 1) DIV $targetPerTask AS BIGINT)"))
      .withColumn("max_task_rows",
        expr("CAST((n_rows + n_salts - 1) DIV n_salts AS BIGINT)"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** POISSON BOOTSTRAP — the distributed resampling scheme (each unit
  * enters replicate b with an independent Poisson(1) multiplicity,
  * approximating multinomial resampling without any global coordination
  * — the construction that makes bootstrap CIs possible on data that
  * never fits one machine).
  *
  * Everything is DETERMINISTIC and engine-replayable: the uniform draw
  * for (unit, replicate) is an md5 slice (the [[Sampling]] discipline —
  * stable across runs, partitionings and engines; Spark's `rand` would
  * re-roll membership on every recompute), mapped to a weight through
  * the PINNED Poisson(1) inverse-CDF thresholds in integer ppm
  * ([[PoissonCdfPpm]] — library constants, the same numbers in the SQL
  * replay). Replicate statistics are integer sufficient sums; the CI
  * bounds are exact lower quantiles selected by rank over the B
  * replicate means — no float accumulates anywhere.
  *
  * Quantization honesty: weights cap at 8 (P(X>8) ≈ 1.1·10⁻⁹ per draw —
  * at 10¹² draws a handful of caps shave an invisible sliver of tail
  * mass, identically in both engines), and the md5-slice uniform has a
  * 2³² mod 10⁶ bias of ~10⁻⁴ on low values — both are part of the
  * defined semantics, not hidden noise.
  *
  * Scale shape: the B-fold replication happens INSIDE the scan
  * (explode over a literal range), and the per-replicate aggregate is
  * map-side combined — shuffle traffic is B rows per partition, never
  * B× the data. The CI selection runs on the B-row replicate frame.
  */
object Bootstrap {

  /** P(Poisson(1) ≤ k)·10⁶ for k = 0..7; a uniform ppm draw ≥ the last
    * entry maps to weight 8 (the documented cap). */
  val PoissonCdfPpm: Seq[Long] =
    Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L, 999990L)

  /** Deterministic ppm-uniform for (key, replicate, salt): the first 8
    * md5 hex digits mod 10⁶ — the q109/Sampling md5-slice replay. */
  private def uniformPpm(key: Column, rep: Column, salt: String): Column =
    pmod(conv(substring(md5(concat_ws("|",
      key.cast("string"), rep.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long"), lit(1000000L))

  /** Poisson(1) multiplicity of `key` in replicate `rep`. */
  def poissonWeight(key: Column, rep: Column, salt: String): Column = {
    val u = uniformPpm(key, rep, salt)
    PoissonCdfPpm.zipWithIndex.foldRight(lit(8L): Column) {
      case ((thr, k), tail) => when(u < thr, k.toLong).otherwise(tail)
    }
  }

  /** Bootstrap percentile CI for the MEAN of an integral per-unit
    * value.
    *
    * @param df       one row per unit
    * @param keyCol   unit identity (drives the deterministic draws)
    * @param valueCol integral per-unit metric
    * @param reps     replicate count B (≥ 4)
    * @param loPm,hiPm CI bounds in per-mille rank (e.g. 25/975 → the
    *                 2.5%..97.5% percentile interval); each bound is
    *                 the ⌈p·B⌉-th smallest replicate mean
    * @param salt     draw salt (a new salt is a fresh resampling)
    * @return 1 row: n_units, b, mean_micro (the point estimate on the
    *         REAL sample), ci_lo_micro, ci_hi_micro
    */
  def meanCi(df: DataFrame, keyCol: String, valueCol: String, reps: Int,
      loPm: Int, hiPm: Int, salt: String = ""): DataFrame = {
    require(reps >= 4, s"need >= 4 replicates, got $reps")
    require(0 < loPm && loPm < hiPm && hiPm <= 1000, s"bad CI ranks $loPm/$hiPm")
    val base = df.select(col(keyCol).as("k"), col(valueCol).cast("long").as("v"))
    val point = base.agg(count(lit(1)).cast("long").as("n_units"),
      expr("(1000000 * CAST(sum(v) AS DECIMAL(38,0))) DIV count(1)").as("mean_micro"))
    val repMeans = base
      .select(col("k"), col("v"),
        explode(expr(s"sequence(0, ${reps - 1})")).as("rep"))
      .withColumn("w", poissonWeight(col("k"), col("rep"), salt))
      .groupBy("rep")
      .agg(sum(col("w")).as("nb"), sum(col("w") * col("v")).as("sb"))
      .withColumn("m", expr(
        "CASE WHEN nb > 0 THEN (1000000 * CAST(sb AS DECIMAL(38,0))) DIV nb END"))
    val ranked = repMeans.filter(col("m").isNotNull)
      .withColumn("r", row_number().over(Window.orderBy(col("m"))).cast("long"))
      .localCheckpoint(true) // B-row frame, two rank probes
    val b = ranked.agg(max(col("r")).as("b"))
    val sel = ranked.crossJoin(b).agg(
      max(col("b")).as("b"),
      min(when(col("r") >= expr(s"($loPm * b + 999) DIV 1000"), col("m")))
        .as("ci_lo_micro"),
      min(when(col("r") >= expr(s"($hiPm * b + 999) DIV 1000"), col("m")))
        .as("ci_hi_micro"))
    point.crossJoin(sel)
      .select(col("n_units"), col("b"),
        col("mean_micro").cast("long").as("mean_micro"),
        col("ci_lo_micro").cast("long").as("ci_lo_micro"),
        col("ci_hi_micro").cast("long").as("ci_hi_micro"))
  }
}

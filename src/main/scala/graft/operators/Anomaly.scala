package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EVENT-RATE ANOMALY DETECTION: per segment, flag time buckets whose
  * event count deviates from the trailing-window mean by more than
  * `sigmas` standard deviations — the ops-dashboard "error spike" /
  * "traffic cliff" monitor, as a deterministic batch operator (the
  * streaming twin is the same projection over a windowed aggregation).
  *
  * The σ test is INTEGER-EXACT — no doubles anywhere, so no rounding or
  * quantization caveats: with trailing sums S = Σx, Q = Σx², n > 1
  * (current bucket excluded),
  *   |x − S/n| > k·σ  ⇔  (x·n − S)² > k² · (n·Q − S²)
  * (both sides ×n²; σ² = (nQ − S²)/n²). Sums of hourly counts keep
  * every term far below 2^63 for any realistic rate (overflow needs
  * bucket counts ~3·10⁹).
  *
  * Scale shape: one aggregation to (segment, bucket) counts — the only
  * data-sized shuffle — then a per-segment window over the tiny bucket
  * series. Buckets are integer `ms DIV bucketMs` (no calendar
  * functions); segments with fewer than `minHistory` trailing buckets
  * report `is_anomaly = false` (insufficient evidence, not a verdict).
  */
object Anomaly {

  /** `(segment, bucket, n_events, trail_n, trail_sum, trail_sumsq,
    * is_anomaly)` — one row per observed (segment, bucket), trailing
    * stats over the `history` buckets strictly before the current one
    * (observed buckets only: an all-quiet gap contributes no zero rows;
    * feed a densified series if silence should count). */
  /** VALUE outliers by the Iglewicz–Hoaglin modified z-score: per
    * segment, median and MAD (median absolute deviation), then
    * `mz = 0.6745·(x − med)/MAD` per row, quantized to integer micros
    * (identical operation order in the oracle; ±0.5 rounding absorbs the
    * interpolation ulps) and flagged at |mz| > threshold. The robust
    * complement to [[rateAnomalies]]: medians don't move when the
    * outliers themselves do, which is exactly when mean/σ screens fail.
    *
    * Segments where MAD = 0 (over half the values identical) emit null
    * score/flag — "scale-free segment", not a verdict, same contract as
    * minHistory. Scale shape: two grouped EXACT percentile passes (each
    * a per-group sort) + two small joins on the segment key; the
    * at-scale swap is approx_percentile for both passes (mergeable GK
    * sketch, no per-group sort — the q57-documented trade). */
  def robustOutliers(
      df: DataFrame,
      valueCol: String,
      segmentCol: String,
      thresholdMicros: Long = 3500000L
  ): DataFrame = {
    require(thresholdMicros > 0, "threshold must be positive")
    val x = col(valueCol).cast("double")
    val meds = df.groupBy(col(segmentCol).as("segment"))
      .agg(percentile(x, lit(0.5)).as("med"))
    val withMed = df.select(col("*"), col(segmentCol).as("segment"))
      .drop(segmentCol).join(meds, "segment")
    val mads = withMed.groupBy("segment")
      .agg(percentile(abs(x - col("med")), lit(0.5)).as("mad"))
    val mz = floor(lit(0.6745) * (x - col("med")) / col("mad") * 1e6 + 0.5)
      .cast("long")
    withMed.join(mads, "segment")
      .withColumn("mz_micros", when(col("mad") > 0.0, mz))
      .withColumn("is_outlier",
        when(col("mad") > 0.0, abs(col("mz_micros")) > thresholdMicros))
  }

  def rateAnomalies(
      df: DataFrame,
      segmentCol: String,
      tsCol: String,
      bucketMs: Long,
      history: Int = 24,
      sigmas: Int = 3,
      minHistory: Int = 8
  ): DataFrame = {
    require(bucketMs > 0 && history > 1 && sigmas > 0 && minHistory > 1,
      "need positive bucket size, history > 1, positive sigmas")
    val counts = df
      .select(col(segmentCol).as("segment"),
        expr(s"unix_millis($tsCol) DIV ${bucketMs}L").as("bucket"))
      .groupBy("segment", "bucket")
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("segment").orderBy(col("bucket").asc)
      .rowsBetween(-history, -1)
    val x = col("n_events")
    val n = col("trail_n")
    val s = col("trail_sum")
    val q = col("trail_sumsq")
    counts
      .withColumn("trail_n", coalesce(count(x).over(w), lit(0L)))
      .withColumn("trail_sum", coalesce(sum(x).over(w), lit(0L)))
      .withColumn("trail_sumsq", coalesce(sum(x * x).over(w), lit(0L)))
      .withColumn("is_anomaly",
        n >= minHistory &&
          (x * n - s) * (x * n - s) > lit(sigmas.toLong * sigmas) * (n * q - s * s))
  }

  /** INTER-ARRIVAL REGULARITY — the bot/metronome screen: per entity,
    * the squared coefficient of variation of consecutive event gaps,
    * integer-exact. Organic human traffic has bursty gaps (cv² near 1
    * for Poisson-like arrivals, higher for sessions); scripted traffic
    * fires on a timer (cv² near 0). With per-entity gap sums S = Σg,
    * Q = Σg², n gaps:
    *   cv² = var/mean² = (n·Q − S²)/S²,  reported as integer per-myriad
    *   cv2_pm = (n·Q − S²)·10⁴ DIV S²
    * and the flag `regular = cv2_pm <= thresholdPm` (all-zero gaps — a
    * zero-delay replay — report cv2_pm = 0, maximally regular). Products
    * run in DECIMAL(38,0): S ≤ n·maxGap keeps S²·10⁴ within 38 digits
    * through ~10¹⁶ total milliseconds per entity — any realistic log.
    *
    * Scale shape: one user-key shuffle drives both the gap window and
    * the per-entity aggregate (same partitioning, one exchange); output
    * is entity-sized. Entities with fewer than `minGaps` gaps are
    * excluded (no evidence, no verdict — the q91 minHistory posture). */
  def interArrivalRegularity(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      minGaps: Long = 10L,
      thresholdPm: Long = 1000L
  ): DataFrame = {
    require(minGaps >= 2L, "minGaps must be >= 2 (variance needs 2 gaps)")
    require(thresholdPm >= 0L, "thresholdPm must be >= 0")
    val byEntity = Window.partitionBy("entity")
      .orderBy(col("ms").asc, col("eid").asc)
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val gaps = df
      .select(col(entityCol).as("entity"), unix_millis(col(tsCol)).as("ms"),
        col(idCol).as("eid"))
      .withColumn("gap", col("ms") - lag(col("ms"), 1).over(byEntity))
      .filter(col("gap").isNotNull)
    gaps
      .groupBy("entity")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("s1"),
        sum(big(col("gap")) * col("gap")).cast("decimal(38,0)").as("s2"))
      .filter(col("n_gaps") >= minGaps)
      .select(col("entity"), col("n_gaps"),
        expr("s1 DIV n_gaps").as("mean_gap_ms"),
        when(col("s1") > 0,
          // integral DIV (not decimal `/`, which rounds at result scale)
          expr("""(CAST(n_gaps AS DECIMAL(38,0)) * s2
                   - CAST(s1 AS DECIMAL(38,0)) * s1) * 10000
                  DIV (CAST(s1 AS DECIMAL(38,0)) * s1)""").cast("long"))
          .otherwise(0L).as("cv2_pm"))
      .withColumn("regular", col("cv2_pm") <= thresholdPm)
      .orderBy("entity")
  }

  /** HAMPEL FILTER — rolling-median outlier detection over a per-key
    * series: a point is flagged when it deviates from its CENTERED
    * window median by more than `kPct`% of the window's median absolute
    * deviation (MAD). The robust companion to [[rateAnomalies]]'s
    * trailing-σ test: a level shift poisons a mean/σ monitor for the
    * whole trailing window, while the median/MAD pair shrugs off up to
    * half the window being wild.
    *
    * INTEGER-EXACT: the window VALUES are collected once per row
    * (frame = 2·`half`+1 points of the calendar-bounded series — a
    * constant), and median, MAD, and the flag are all computed from
    * that array in one codegen'd expression chain:
    *   med = sorted[(n+1) DIV 2];  mad = sorted(|v − med|)[(n+1) DIV 2]
    *   outlier ⇔ 100·|y − med| > kPct·mad
    * (lower-median convention on even frames, exact in both engines;
    * mad = 0 makes ANY deviation an outlier — deterministic, and the
    * honest reading of a half-window of identical values).
    *
    * @return (key, x, y, med, mad, outlier) — one row per input point
    */
  def hampel(series: DataFrame, keyCol: String, xCol: String,
             yCol: String, half: Int, kPct: Long): DataFrame = {
    require(half >= 1 && half <= 50, "half-window in [1,50]")
    require(kPct > 0, "kPct must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("x"))
      .rowsBetween(-half, half)
    series
      .select(col(keyCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .withColumn("_win", array_sort(collect_list(col("y")).over(w)))
      .withColumn("med",
        expr("element_at(_win, CAST((size(_win) + 1) DIV 2 AS INT))"))
      .withColumn("mad", expr(
        """element_at(array_sort(transform(_win, v -> abs(v - med))),
          |  CAST((size(_win) + 1) DIV 2 AS INT))""".stripMargin.replace("\n", " ")))
      .withColumn("outlier",
        (expr("100 * abs(y - med)") > col("mad") * kPct).cast("long"))
      .select(col(keyCol), col("x"), col("y"), col("med"), col("mad"),
        col("outlier"))
      .orderBy(col(keyCol), col("x"))
  }

  /** INTER-EVENT GAP HISTOGRAM — per key, the distribution of day gaps
    * between an entity's consecutive events (gap ≥ 1 day), plus the
    * counting median gap: the cadence fingerprint behind churn alarms
    * and send-frequency tuning. One (entity, key)-partitioned lag, one
    * map-side-combined histogram shuffle; the median is read off the
    * cumulative histogram (quantile-by-counting — no per-row sort).
    *
    * @return (key, gap_days, n, cum_n, total, is_median) ordered by
    *         (key, gap_days); is_median marks the counting-median row
    */
  def interEventGaps(df: DataFrame, keyCol: String, entityCol: String,
                     dayCol: String): DataFrame = {
    val byEnt = Window.partitionBy(col(keyCol), col(entityCol))
      .orderBy(col("d"))
    val gaps = df
      .select(col(keyCol), col(entityCol), col(dayCol).cast("long").as("d"))
      .distinct() // one row per (key, entity, day): gaps are day-grained
      .withColumn("gap", col("d") - lag(col("d"), 1).over(byEnt))
      .filter(col("gap") >= 1)
      .groupBy(col(keyCol), col("gap").as("gap_days"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("gap_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
    gaps
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("is_median",
        (col("cum_n") - col("n") < expr("(total + 1) DIV 2") &&
          col("cum_n") >= expr("(total + 1) DIV 2")).cast("long"))
      .orderBy(col(keyCol), col("gap_days"))
  }
}

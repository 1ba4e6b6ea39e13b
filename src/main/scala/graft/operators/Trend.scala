package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TIME-SERIES TREND ANALYTICS — per-key daily-series diagnostics, every
  * statistic integer-exact so the readout is bit-identical on any engine
  * and any aggregation order.
  *
  * The family operates on an ALREADY-AGGREGATED series frame (key, x, y)
  * — x an integral index (epoch day), y an integral measure (count,
  * cents) — which is the scale contract: the raw event log collapses to
  * keys × days rows in one map-side-combined aggregate, and everything
  * here runs on that days-sized frame. Windows partition by key over
  * day-bounded partitions (a year is 366 rows), so "No Partition Defined"
  * never appears and no partition can exceed the calendar.
  *
  * Numeric discipline (the [[Experiment]] convention): every ratio is
  * cross-multiplied into integer products held in DECIMAL(38,0) and
  * divided once with truncating `DIV` (Spark's IntegralDivide; DuckDB
  * `//` agrees on negatives), reported in scaled integer units
  * (ppm/micro). Overflow throws loudly under ANSI decimal — never a
  * silent wrong trend.
  */
object Trend {

  private def big(c: Column): Column = c.cast("decimal(38,0)")

  /** Per-key ordinary-least-squares trend over (x, y) points.
    *
    * Sufficient statistics only — one aggregate per key computes n, Σx,
    * Σy, Σxy, Σx², Σy² (x re-based to the per-key minimum so products
    * stay small); slope and fit quality come out as
    *
    *     slope_ppm = 10⁶·(n·Σxy − Σx·Σy)  DIV  (n·Σx² − (Σx)²)
    *     r2_ppm    = (slope_ppm·(n·Σxy − Σx·Σy)) DIV (n·Σy² − (Σy)²)
    *
    * r2_ppm nests the already-truncated slope_ppm rather than squaring
    * the numerator (num²·10⁶ would breach 38 digits first); the oracle
    * replays the same nesting, so the truncation is part of the defined
    * semantics. Degenerate keys (single point, or zero x/y variance)
    * report NULL slope/r² instead of dividing by zero.
    *
    * Scale shape: input is the pre-aggregated series frame; the min-x
    * re-base is a per-key scalar join (key-count-sized), then ONE
    * aggregate. No windows, no driver state.
    *
    * @param series (key, x, y) frame, integral x and y
    * @return key, n, slope_ppm (y-units per x-unit, ×10⁶), r2_ppm
    */
  def olsTrend(series: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val ser = series.localCheckpoint(true) // consumed twice (re-base + points)
    val base = ser.groupBy(col(keyCol)).agg(min(col(xCol)).as("x0"))
    val pts = ser.join(base, keyCol)
      .select(col(keyCol),
        (col(xCol) - col("x0")).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
    val s = pts.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(big(col("x"))).as("sx"),
      sum(big(col("y"))).as("sy"),
      sum(big(col("x")) * big(col("y"))).as("sxy"),
      sum(big(col("x")) * big(col("x"))).as("sxx"),
      sum(big(col("y")) * big(col("y"))).as("syy"))
    s.withColumn("num", big(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den_x", big(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("den_y", big(col("n")) * col("syy") - col("sy") * col("sy"))
      .withColumn("slope_ppm",
        expr("CASE WHEN den_x > 0 THEN (1000000 * num) DIV den_x END"))
      .withColumn("r2_ppm",
        expr("CASE WHEN den_x > 0 AND den_y > 0 THEN (slope_ppm * num) DIV den_y END"))
      .select(col(keyCol), col("n"), col("slope_ppm"), col("r2_ppm"))
      .orderBy(keyCol)
  }

  /** Per-key single changepoint locator — the CUSUM-family statistic
    *
    *     D_t = |n·P_t − t·S|,   P_t = Σ_{i≤t} y_i,  S = Σ y,  t = 1..n
    *
    * (the deviation of the running sum from the constant-rate line,
    * scaled by n so it stays integral). The reported changepoint is the
    * EARLIEST x attaining max D_t — the boundary after which the series'
    * level shifts most. d_max_pm = 10⁶·D_max DIV (n·S) normalizes to the
    * series mass (0 for a perfectly constant-rate series).
    *
    * One window pass per key (cumulative sum over a day-bounded
    * partition), one per-key aggregate, one back-join on the argmax.
    */
  def changePoint(series: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("x"))
    // the cumulative frame feeds four consumers (totals, deviations,
    // argmax, back-join); materialize it so the upstream series — and
    // whatever scan produced it — runs exactly once
    val cum = series.select(col(keyCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("p", sum(col("y")).over(w))
      .localCheckpoint(true)
    val tot = cum.groupBy(col(keyCol))
      .agg(max(col("t")).as("n"), sum(col("y")).as("s"))
    val d = cum.join(tot, keyCol)
      .withColumn("d", abs(big(col("n")) * big(col("p")) - big(col("t")) * big(col("s"))))
    val dmax = d.groupBy(col(keyCol)).agg(max(col("d")).as("d_max"))
    d.join(dmax, keyCol)
      .filter(col("d") === col("d_max"))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"), max(col("s")).as("total"),
        min(col("x")).as("cp_x"), max(col("d_max")).as("dm"))
      .withColumn("d_max", expr("CAST(dm AS BIGINT)"))
      .withColumn("d_max_pm", expr(
        "CASE WHEN total > 0 THEN (1000000 * dm) DIV (CAST(n AS DECIMAL(38,0)) * total) END"))
      .select(col(keyCol), col("n"), col("total"), col("cp_x"),
        col("d_max"), col("d_max_pm"))
      .orderBy(keyCol)
  }

  /** Per-key autocorrelation function at lags 1..maxLag over a
    * CONTIGUOUSLY RE-INDEXED series (t = row_number by x, so calendar
    * gaps collapse — the caller zero-fills first if gaps must count).
    *
    * The classic large-n estimator, n-scaled to stay integral: with
    * S = Σy and d_t = n·y_t − S,
    *
    *     acf_pm(k) = 10⁶ · Σ_{t≤n−k} d_t·d_{t+k}  DIV  Σ_t d_t²
    *
    * (one shared denominator across lags — Box–Jenkins form, which keeps
    * the lag profile comparable). Negative numerators divide toward zero
    * identically on both engines.
    *
    * Scale shape: one window pass to index, one self-equi-join on
    * (key, t+k) against the broadcast lag spine — join input is
    * keys × days × lags rows, all bounded by the calendar.
    */
  def acf(series: DataFrame, keyCol: String, xCol: String, yCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(xCol))
    val idx = series.select(col(keyCol), col(xCol), col(yCol).cast("long").as("y"))
      .withColumn("t", row_number().over(w).cast("long"))
      .localCheckpoint(true) // feeds totals AND both join sides
    val tot = idx.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("y")).as("s"))
    val dev = idx.join(tot, keyCol)
      .select(col(keyCol), col("t"),
        (big(col("n")) * big(col("y")) - big(col("s"))).as("d"))
      .localCheckpoint(true) // consumed by den, lagged and the pair probe
    val den = dev.groupBy(col(keyCol)).agg(sum(col("d") * col("d")).as("den"))
    val lags = series.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("long").as("lag_k"))
    val lagged = dev.crossJoin(broadcast(lags))
      .select(col(keyCol), col("lag_k"), (col("t") + col("lag_k")).as("t2"), col("d").as("d1"))
    val pair = lagged.join(
        dev.select(col(keyCol), col("t").as("t2"), col("d").as("d2")),
        Seq(keyCol, "t2"))
      .groupBy(col(keyCol), col("lag_k"))
      .agg(sum(col("d1") * col("d2")).as("num"), count(lit(1)).as("n_pairs"))
    pair.join(den, keyCol)
      .withColumn("acf_pm",
        expr("CASE WHEN den > 0 THEN (1000000 * num) DIV den END"))
      .select(col(keyCol), col("lag_k"), col("n_pairs"), col("acf_pm"))
      .orderBy(col(keyCol), col("lag_k"))
  }

  /** Per-key SEASONAL RESIDUAL SCREEN — each observation against its
    * own seasonal slot's mean, in exact per-mille excess:
    *
    *     excess_pm = 1000·y·c_slot DIV s_slot − 1000
    *
    * (slot = x mod period; c/s = the slot's count/sum within the key —
    * cross-multiplied so no rational mean is ever materialized). The
    * deseasonalized anomaly screen: a Friday spike is only a spike if
    * it is large FOR A FRIDAY. `burst` flags |excess| ≥ thresholdPm.
    *
    * One aggregate to the (key × period) slot frame, one broadcast-size
    * join back — the series frame never re-shuffles.
    */
  def seasonalResiduals(series: DataFrame, keyCol: String, xCol: String,
      yCol: String, period: Int, thresholdPm: Long): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val ser = series.select(col(keyCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .withColumn("slot", expr(s"x % $period"))
      .localCheckpoint(true) // slot stats + residuals: one upstream run
    val slots = ser.groupBy(col(keyCol), col("slot"))
      .agg(sum(col("y")).as("s"), count(lit(1)).as("c"))
    ser.join(slots, Seq(keyCol, "slot"))
      .withColumn("excess_pm", expr(
        """CASE WHEN s > 0
          |THEN (1000 * CAST(y AS DECIMAL(38,0)) * c) DIV s - 1000 END""".stripMargin))
      .withColumn("burst",
        col("excess_pm").isNotNull && abs(col("excess_pm")) >= thresholdPm)
      .select(col(keyCol), col("x"), col("y"), col("slot"),
        col("excess_pm"), col("burst"))
      .orderBy(keyCol, "x")
  }

  /** CROSS-CORRELATION MATRIX over keys sharing an x-axis — for every
    * key pair (a < b), the SIGNED squared Pearson correlation of their
    * series joined on x:
    *
    *     signed_r2_ppm = sign(num) · (10⁶·num DIV den_a)·num DIV den_b
    *
    * (num = n·Σab − Σa·Σb — the [[olsTrend]] nesting, so r² is exact
    * integer arithmetic; the sign carries the direction that plain r²
    * destroys). NULL when either side is constant over the shared days.
    *
    * Key-count² pairs, each from one sufficient-stats aggregate over
    * the x-equi-joined series — with keys = event types this is a
    * domain-sized frame; the series join is on the (x) day key.
    */
  def crossCorrelation(series: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val ser = series.select(col(keyCol).cast("string").as("k"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .localCheckpoint(true) // both join sides
    val joined = ser.select(col("k").as("key_a"), col("x"), col("y").as("ya"))
      .join(ser.select(col("k").as("key_b"), col("x"), col("y").as("yb")), "x")
      .filter(col("key_a") < col("key_b"))
    joined.groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("n"),
        sum(big(col("ya"))).as("sa"), sum(big(col("yb"))).as("sb"),
        sum(big(col("ya")) * big(col("yb"))).as("sab"),
        sum(big(col("ya")) * big(col("ya"))).as("saa"),
        sum(big(col("yb")) * big(col("yb"))).as("sbb"))
      .withColumn("num", big(col("n")) * col("sab") - col("sa") * col("sb"))
      .withColumn("den_a", big(col("n")) * col("saa") - col("sa") * col("sa"))
      .withColumn("den_b", big(col("n")) * col("sbb") - col("sb") * col("sb"))
      .withColumn("signed_r2_ppm", expr(
        """CASE WHEN den_a > 0 AND den_b > 0 THEN
          |  (CASE WHEN num < 0 THEN -1 ELSE 1 END)
          |  * ((((1000000 * num) DIV den_a) * num) DIV den_b) END""".stripMargin))
      .select(col("key_a"), col("key_b"), col("n"), col("signed_r2_ppm"))
      .orderBy("key_a", "key_b")
  }

  /** Per-key SEASONAL-NAIVE FORECAST BACKTEST — how predictable is the
    * series, and does the season carry signal? Two zero-parameter
    * forecasters are replayed over the contiguously re-indexed series:
    * seasonal-naive ŷ_t = y_{t−season} and last-value ŷ_t = y_{t−1},
    * both evaluated on the SAME rows (t > season, where both exist) so
    * the comparison is apples-to-apples. Integer readout:
    *
    *     mae_seasonal_micro = 10⁶·Σ|y_t − y_{t−s}| DIV n_eval
    *     mae_naive_micro    = 10⁶·Σ|y_t − y_{t−1}| DIV n_eval
    *     ratio_ppm          = 10⁶·Σ|e_s| DIV Σ|e_1|   (< 10⁶ ⇒ the
    *                          season beats persistence — real weekly
    *                          structure; NULL when Σ|e_1| = 0)
    *
    * One window pass per key (two lags over calendar-bounded
    * partitions), one aggregate. The model-selection readout a capacity
    * planner runs before trusting any seasonal forecast.
    */
  def seasonalNaiveBacktest(series: DataFrame, keyCol: String, xCol: String,
      yCol: String, season: Int): DataFrame = {
    require(season >= 2, s"season must be >= 2, got $season")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(xCol))
    series.select(col(keyCol), col(xCol), col(yCol).cast("long").as("y"))
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("y_s", lag(col("y"), season).over(w))
      .withColumn("y_1", lag(col("y"), 1).over(w))
      .filter(col("t") > season)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_eval"),
        sum(abs(col("y") - col("y_s"))).cast("long").as("sae_seasonal"),
        sum(abs(col("y") - col("y_1"))).cast("long").as("sae_naive"))
      .withColumn("mae_seasonal_micro",
        expr("(1000000 * CAST(sae_seasonal AS DECIMAL(38,0))) DIV n_eval"))
      .withColumn("mae_naive_micro",
        expr("(1000000 * CAST(sae_naive AS DECIMAL(38,0))) DIV n_eval"))
      .withColumn("ratio_ppm", expr(
        """CASE WHEN sae_naive > 0
          |THEN (1000000 * CAST(sae_seasonal AS DECIMAL(38,0))) DIV sae_naive
          |END""".stripMargin))
      .select(col(keyCol), col("n_eval"), col("mae_seasonal_micro"),
        col("mae_naive_micro"), col("ratio_ppm"))
      .orderBy(keyCol)
  }

  /** Per-key Theil–Sen robust slope — the LOWER MEDIAN of all pairwise
    * slopes, each pre-quantized to integral micro-units
    *
    *     slope_micro(i,j) = 10⁶·(y_j − y_i) DIV (x_j − x_i),  x_i < x_j
    *
    * so the median selection is over integers (rank (m+1) DIV 2 of the
    * value-sorted pair frame — deterministic under ties because equal
    * values are interchangeable). Quantize-then-select is the defined
    * semantics; the oracle replays it literally.
    *
    * The O(d²)-per-key pair frame is the point of the operator — d is
    * CALENDAR-bounded (366 days → 66 795 pairs per key), so the frame
    * stays audit-sized at any corpus scale; the event log never joins
    * itself.
    */
  def theilSen(series: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val ser = series.localCheckpoint(true) // self-joined: one upstream run
    val a = ser.select(col(keyCol), col(xCol).cast("long").as("xi"),
      col(yCol).cast("long").as("yi"))
    val b = ser.select(col(keyCol), col(xCol).cast("long").as("xj"),
      col(yCol).cast("long").as("yj"))
    val pairs = a.join(b, Seq(keyCol)).filter(col("xi") < col("xj"))
      .select(col(keyCol),
        expr("(1000000 * (yj - yi)) DIV (xj - xi)").as("slope_micro"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("slope_micro"))
    pairs.withColumn("r", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("r") === expr("(m + 1) DIV 2"))
      .select(col(keyCol), col("m").as("n_pairs"),
        col("slope_micro").as("ts_slope_micro"))
      .orderBy(keyCol)
  }

  /** Per-key series packed to a sorted (x, y) array — the family's shape
    * for SEQUENTIAL recursions: the series contract bounds a key's array
    * at calendar size, so `collect_list` is domain-bounded by design and
    * the recursion runs inside one codegen'd higher-order expression,
    * never as a driver loop or a per-row window chain. */
  private def packed(series: DataFrame, keyCol: String, xCol: String,
                     yCol: String): DataFrame =
    series
      .select(col(keyCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("x"), col("y")))).as("s"))

  /** EXPONENTIALLY-WEIGHTED MOVING AVERAGE per key, in truncating
    * integer micros with a rational smoothing factor α = aNum/aDen:
    *
    *     e₁ = y₁·10⁶;   eᵢ = (aNum·yᵢ·10⁶ + (aDen−aNum)·eᵢ₋₁) DIV aDen
    *
    * A sequential recursion has no closed form under truncation, so it
    * is evaluated AS a recursion — but in the array domain: one
    * `aggregate` fold over the packed per-key series appends each step's
    * state, then the array unzips back to rows. The SQL oracle replays
    * the identical recurrence with WITH RECURSIVE (both engines'
    * integral division truncates toward zero, so signed steps agree).
    *
    * @return (key, x, y, ewma_micro) — one row per input point
    */
  def ewmaSeries(series: DataFrame, keyCol: String, xCol: String,
                 yCol: String, aNum: Long, aDen: Long): DataFrame = {
    require(aNum > 0 && aNum <= aDen, "alpha in (0,1]")
    packed(series, keyCol, xCol, yCol)
      .withColumn("e", expr(
        s"""aggregate(s, CAST(array() AS ARRAY<BIGINT>),
           |  (acc, p) -> array_append(acc,
           |    CASE WHEN size(acc) = 0 THEN p.y * 1000000L
           |         ELSE ($aNum * p.y * 1000000L
           |               + ($aDen - $aNum) * element_at(acc, -1))
           |              DIV $aDen END))""".stripMargin.replace("\n", " ")))
      .select(col(keyCol), posexplode(col("s")).as(Seq("i", "p")), col("e"))
      .select(col(keyCol), col("p.x").as("x"), col("p.y").as("y"),
        element_at(col("e"), col("i") + 1).as("ewma_micro"))
      .orderBy(col(keyCol), col("x"))
  }

  /** HOLT'S LINEAR TREND forecast per key — the two-variable sequential
    * recursion (level + trend) in truncating micros with rational
    * factors α = aNum/aDen, β = bNum/bDen:
    *
    *     l₁ = y₁·10⁶, b₁ = 0
    *     lᵢ = (aNum·yᵢ·10⁶ + (aDen−aNum)·(lᵢ₋₁+bᵢ₋₁)) DIV aDen
    *     bᵢ = (bNum·(lᵢ−lᵢ₋₁) + (bDen−bNum)·bᵢ₋₁) DIV bDen
    *     ŷ(n+h) = lₙ + h·bₙ
    *
    * Same array-domain fold as [[ewmaSeries]], carrying a struct state;
    * bᵢ can go negative, which is exactly why the truncate-toward-zero
    * division convention is pinned in both engines.
    *
    * @return (key, h, forecast_micro, level_micro, trend_micro) for
    *         h = 1..horizon
    */
  def holtForecast(series: DataFrame, keyCol: String, xCol: String,
                   yCol: String, aNum: Long, aDen: Long, bNum: Long,
                   bDen: Long, horizon: Int): DataFrame = {
    require(aNum > 0 && aNum <= aDen && bNum > 0 && bNum <= bDen,
      "alpha, beta in (0,1]")
    require(horizon >= 1 && horizon <= 366, "horizon in [1,366]")
    val lNext = s"(($aNum * p.y * 1000000L" +
      s" + ($aDen - $aNum) * (acc.l + acc.b)) DIV $aDen)"
    packed(series, keyCol, xCol, yCol)
      .withColumn("st", expr(
        s"""aggregate(s,
           |  named_struct('l', CAST(NULL AS BIGINT), 'b', CAST(NULL AS BIGINT)),
           |  (acc, p) -> CASE WHEN acc.l IS NULL
           |    THEN named_struct('l', p.y * 1000000L, 'b', 0L)
           |    ELSE named_struct('l', $lNext,
           |      'b', ($bNum * ($lNext - acc.l)
           |            + ($bDen - $bNum) * acc.b) DIV $bDen) END)"""
          .stripMargin.replace("\n", " ")))
      .select(col(keyCol), explode(sequence(lit(1L), lit(horizon.toLong)))
        .as("h"), col("st"))
      .select(col(keyCol), col("h"),
        (col("st.l") + col("h") * col("st.b")).as("forecast_micro"),
        col("st.l").as("level_micro"), col("st.b").as("trend_micro"))
      .orderBy(col(keyCol), col("h"))
  }

  /** CALENDAR DENSIFY — zero-fill the missing integer x of each key's
    * [min, max] span: the primitive this whole family's contract
    * assumes ("the caller zero-fills first" — [[acf]], [[ewmaSeries]]
    * et al. index by ROW, so a gap silently compresses time unless the
    * spine is dense). Emits every (key, x) of the span with the summed
    * y (0 where absent) and an `is_filled` marker.
    *
    * Scale shape: one map-side-combined aggregate to the (key, x)
    * frame, a per-key span aggregate, and an array-side
    * `explode(sequence(lo, hi))` — the span is calendar-bounded by the
    * series contract, so the generated spine is keys × span rows,
    * never data-sized blowup; the back-join is on the (key, x) grain.
    *
    * @return (key, x, y, is_filled) dense over each key's span
    */
  def densify(series: DataFrame, keyCol: String, xCol: String,
              yCol: String): DataFrame = {
    val base = series
      .select(col(keyCol), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(col(keyCol), col("x")).agg(sum(col("y")).as("y"))
      .localCheckpoint(true) // spans + the back-join share one build
    val spine = base.groupBy(col(keyCol))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .select(col(keyCol), explode(expr("sequence(lo, hi)")).as("x"))
    spine.join(base, Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("x"),
        coalesce(col("y"), lit(0L)).as("y"),
        col("y").isNull.cast("long").as("is_filled"))
      .orderBy(col(keyCol), col("x"))
  }

  /** HOLT–WINTERS ADDITIVE (triple) smoothing per key — the full
    * level + trend + SEASONAL recursion, completing the
    * [[ewmaSeries]]/[[holtForecast]] family with the member that tracks
    * weekly shape:
    *
    *     init (first `period` points): l = ⌊mean(y₁..y_p)·10⁶⌋, b = 0,
    *       s_j = y_j·10⁶ − l  (j = 1..p)
    *     for i > p, slot = (i−1) mod p:
    *       l' = (aNum·(yᵢ·10⁶ − s_slot) + (aDen−aNum)·(l+b)) DIV aDen
    *       b' = (bNum·(l'−l) + (bDen−bNum)·b) DIV bDen
    *       s_slot' = (gNum·(yᵢ·10⁶ − l') + (gDen−gNum)·s_slot) DIV gDen
    *     ŷ(n+h) = l + h·b + s_{(n+h−1) mod p}
    *
    * The state is a STRUCT carrying the seasonal ring as a p-slot array,
    * folded over the packed per-key series inside one codegen'd
    * expression — a three-variable sequential recursion with array
    * state, no driver loop, no window. Signed throughout (seasonal
    * deviations go negative), which is why the truncate-toward-zero
    * division convention is pinned in both engines. Keys shorter than
    * `period`+1 points are dropped (no season to calibrate).
    *
    * @return (key, h, forecast_micro, level_micro, trend_micro,
    *         seasonal_micro) for h = 1..horizon
    */
  def holtWinters(series: DataFrame, keyCol: String, xCol: String,
                  yCol: String, period: Int, aNum: Long, aDen: Long,
                  bNum: Long, bDen: Long, gNum: Long, gDen: Long,
                  horizon: Int): DataFrame = {
    require(period >= 2 && period <= 366, "period in [2,366]")
    require(aNum > 0 && aNum <= aDen && bNum > 0 && bNum <= bDen &&
      gNum > 0 && gNum <= gDen, "alpha, beta, gamma in (0,1]")
    require(horizon >= 1 && horizon <= 366, "horizon in [1,366]")
    val p = period
    // previous seasonal for the CURRENT step (i = acc.i + 1, slot =
    // acc.i % p; the ring is 1-based via element_at)
    val sPrev = s"element_at(acc.si, CAST(acc.i % $p AS INT) + 1)"
    val lNew = s"(($aNum * (q.y * 1000000L - $sPrev)" +
      s" + ($aDen - $aNum) * (acc.l + acc.b)) DIV $aDen)"
    packed(series, keyCol, xCol, yCol)
      .filter(size(col("s")) > p)
      .withColumn("l0", expr(
        s"aggregate(slice(s, 1, $p), 0L, (a, q) -> a + q.y) * 1000000L DIV $p"))
      .withColumn("st", expr(
        s"""aggregate(slice(s, ${p + 1}, size(s) - $p),
           |  named_struct('l', l0, 'b', 0L, 'i', CAST($p AS BIGINT),
           |    'si', transform(slice(s, 1, $p), q -> q.y * 1000000L - l0)),
           |  (acc, q) -> named_struct(
           |    'l', $lNew,
           |    'b', ($bNum * ($lNew - acc.l)
           |          + ($bDen - $bNum) * acc.b) DIV $bDen,
           |    'i', acc.i + 1,
           |    'si', transform(acc.si, (v, j) ->
           |      CASE WHEN j = CAST(acc.i % $p AS INT)
           |           THEN ($gNum * (q.y * 1000000L - $lNew)
           |                 + ($gDen - $gNum) * $sPrev) DIV $gDen
           |           ELSE v END)))""".stripMargin.replace("\n", " ")))
      .select(col(keyCol),
        explode(sequence(lit(1L), lit(horizon.toLong))).as("h"), col("st"))
      .select(col(keyCol), col("h"),
        (col("st.l") + col("h") * col("st.b") +
          expr(s"element_at(st.si, CAST((st.i + h - 1) % $p AS INT) + 1)"))
          .as("forecast_micro"),
        col("st.l").as("level_micro"), col("st.b").as("trend_micro"),
        expr(s"element_at(st.si, CAST((st.i + h - 1) % $p AS INT) + 1)")
          .as("seasonal_micro"))
      .orderBy(col(keyCol), col("h"))
  }

  /** ONE-SIDED UPWARD CUSUM per key — the sequential drift detector that
    * catches SLOW level creep a point-outlier rule misses: the running
    * statistic accumulates every excess over (target + slack) and resets
    * at zero,
    *
    *     S₀ = 0;  Sᵢ = max(0, Sᵢ₋₁ + yᵢ·10⁶ − target − slack)
    *
    * with the target self-calibrated as the truncating mean of the first
    * `baseline` points (×10⁶). An alarm fires while Sᵢ > hMicro. All
    * arithmetic is integer micros, so a WITH RECURSIVE oracle replays
    * the trajectory bit-exactly.
    *
    * Same packed array-domain fold as [[ewmaSeries]] — the recursion
    * runs inside one codegen'd expression over the calendar-bounded
    * per-key series (streaming-safe by the same argument as the EWMA
    * twin: state is the re-sorted packed series, not an arrival-order
    * scalar).
    *
    * @return (key, x, y, cusum_micro, alarm) — one row per input point
    */
  def cusum(series: DataFrame, keyCol: String, xCol: String, yCol: String,
            baseline: Int, slackMicro: Long, hMicro: Long): DataFrame = {
    require(baseline >= 1, "baseline must be positive")
    require(slackMicro >= 0 && hMicro > 0, "slack >= 0, h > 0")
    packed(series, keyCol, xCol, yCol)
      // truncating baseline mean in micros (capped at the series length)
      .withColumn("tgt", expr(
        s"""aggregate(slice(s, 1, $baseline), 0L, (a, p) -> a + p.y)
           | * 1000000L DIV least(CAST($baseline AS BIGINT), size(s))"""
          .stripMargin.replace("\n", " ")))
      .withColumn("c", expr(
        s"""aggregate(s, CAST(array() AS ARRAY<BIGINT>),
           |  (acc, p) -> array_append(acc, greatest(0L,
           |    CASE WHEN size(acc) = 0 THEN 0L
           |         ELSE element_at(acc, -1) END
           |    + p.y * 1000000L - tgt - ${slackMicro}L)))"""
          .stripMargin.replace("\n", " ")))
      .select(col(keyCol), posexplode(col("s")).as(Seq("i", "p")),
        col("c"), col("tgt"))
      .select(col(keyCol), col("p.x").as("x"), col("p.y").as("y"),
        col("tgt").as("target_micro"),
        element_at(col("c"), col("i") + 1).as("cusum_micro"))
      .withColumn("alarm", (col("cusum_micro") > hMicro).cast("int").cast("long"))
      .orderBy(col(keyCol), col("x"))
  }

  /** CUSUM CONTINUATION — resume [[cusum]] from a persisted per-key
    * state (the stored-state serving discipline, q136/q239): `state`
    * carries one row per key with the FROZEN calibration target and the
    * statistic's last value, and the fold starts from that value
    * instead of zero. (target, S) is the complete sufficient state of
    * the recursion, so continuing from a snapshot is bit-identical to
    * replaying the full history — the q267 gate proves it against the
    * full-batch oracle.
    *
    * @param state (keyCol, target_micro, cusum_micro) — e.g. the last
    *              trajectory row per key from a prior [[cusum]] run
    */
  def cusumFrom(series: DataFrame, keyCol: String, xCol: String,
                yCol: String, state: DataFrame, slackMicro: Long,
                hMicro: Long): DataFrame = {
    require(slackMicro >= 0 && hMicro > 0, "slack >= 0, h > 0")
    packed(series, keyCol, xCol, yCol)
      .join(state.select(col(keyCol), col("target_micro").as("tgt"),
        col("cusum_micro").as("s0")), keyCol)
      .withColumn("c", expr(
        s"""aggregate(s, CAST(array() AS ARRAY<BIGINT>),
           |  (acc, p) -> array_append(acc, greatest(0L,
           |    CASE WHEN size(acc) = 0 THEN s0
           |         ELSE element_at(acc, -1) END
           |    + p.y * 1000000L - tgt - ${slackMicro}L)))"""
          .stripMargin.replace("\n", " ")))
      .select(col(keyCol), posexplode(col("s")).as(Seq("i", "p")),
        col("c"), col("tgt"))
      .select(col(keyCol), col("p.x").as("x"), col("p.y").as("y"),
        col("tgt").as("target_micro"),
        element_at(col("c"), col("i") + 1).as("cusum_micro"))
      .withColumn("alarm", (col("cusum_micro") > hMicro).cast("int").cast("long"))
      .orderBy(col(keyCol), col("x"))
  }

  /** MAXIMUM DRAWDOWN per key — the deepest peak-to-current drop of the
    * series, with the (earliest) x where it bottoms: the classic
    * "worst slump" diagnostic for any monitored metric.
    *
    * Same packed array-domain fold as [[ewmaSeries]]/[[holtForecast]]
    * (it IS a sequential recursion: the running peak carries forward):
    * one struct state (running peak, deepest drawdown so far, its x)
    * folds over the sorted per-key series inside a single codegen'd
    * expression — no per-key window, and because the state is the
    * calendar-bounded packed series this operator is STREAMING-SAFE
    * under complete-mode replay (the StreamingSpec twin proves late
    * arrivals re-sort into event-time order). A STRICT `>` keeps the
    * EARLIEST x among maximal drawdowns, matching the (dd, −x) struct
    * max of the windowed formulation it replaces.
    *
    * @return (key, peak_y, max_dd, trough_x)
    */
  def maxDrawdown(series: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame =
    packed(series, keyCol, xCol, yCol)
      .withColumn("st", expr(
        """aggregate(s,
          |  named_struct('pk', CAST(NULL AS BIGINT), 'dd', 0L,
          |               'tx', CAST(NULL AS BIGINT)),
          |  (acc, p) -> CASE WHEN acc.pk IS NULL
          |    THEN named_struct('pk', p.y, 'dd', 0L, 'tx', p.x)
          |    ELSE named_struct(
          |      'pk', greatest(acc.pk, p.y),
          |      'dd', CASE WHEN greatest(acc.pk, p.y) - p.y > acc.dd
          |                 THEN greatest(acc.pk, p.y) - p.y
          |                 ELSE acc.dd END,
          |      'tx', CASE WHEN greatest(acc.pk, p.y) - p.y > acc.dd
          |                 THEN p.x ELSE acc.tx END) END)"""
          .stripMargin.replace("\n", " ")))
      .filter(col("st.pk").isNotNull)
      .select(col(keyCol), col("st.pk").as("peak_y"),
        col("st.dd").as("max_dd"), col("st.tx").as("trough_x"))
      .orderBy(keyCol)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DATA PROFILING — the read-side companion to [[Contracts]]: equi-width
  * histograms and per-group column summaries, both as single
  * map-side-combined aggregation passes.
  *
  * Engine-exactness posture: bin assignment is `floor((v − lo) / width)`
  * where the caller picks `lo`/`hi`/`bins` so `width` is exactly
  * representable (e.g. 10.0) — IEEE division and floor are then
  * correctly rounded identically on every engine. Summaries report
  * counts (long) and raw min/max (untouched doubles), never derived
  * float moments, so results hash-compare across engines.
  */
object Profile {

  /** `(groupCols…, bin, bin_lo, bin_hi, n)` — values binned into `bins`
    * equal widths over [lo, hi); out-of-range values CLAMP into the edge
    * bins (so totals reconcile with row counts and a stray outlier is
    * visible at the edge rather than silently dropped); NULLs are
    * excluded (their count belongs to [[summary]]). Empty bins are
    * absent — the output is group×occupied-bins sized. One aggregation
    * pass; the bin projection is codegen arithmetic. Being a single
    * aggregation, it runs unchanged as a complete-mode streaming query
    * (StreamingSpec twin) — a live distribution monitor. */
  def equiWidthHistogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int
  ): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val raw = floor((col(valueCol) - lit(lo)) / lit(width)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    val keys = groupCols.map(col) :+ bin.as("bin")
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"))
      .select(groupCols.map(col) ++ Seq(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("bin") + lit(1L)) * lit(width)).as("bin_hi"),
        col("n")): _*)
      .orderBy(groupCols.map(col) :+ col("bin"): _*)
  }

  /** FUNCTIONAL-DEPENDENCY AUDIT — for each candidate `determinant →
    * dependent`, does every determinant group map to exactly one
    * dependent value? `(determinant, dependent, n_groups,
    * n_violating_groups, holds)` — the profiling complement to
    * [[Contracts.Unique]] (a key is the FD `key → everything`). NULLs
    * group as values on both sides (a det-group of nulls is a group; a
    * null dependent is a value), matching the contract checker's null
    * discipline.
    *
    * Scale shape: one (determinant ∪ dependent) group-count shuffle per
    * candidate, then a determinant-keyed aggregate over the group table
    * — groups, not rows; the report is candidates-sized. */
  def functionalDependencies(
      df: DataFrame,
      deps: Seq[(Seq[String], String)]
  ): DataFrame = {
    require(deps.nonEmpty, "need at least one candidate dependency")
    deps.map { case (det, dep) =>
      require(det.nonEmpty, "empty determinant")
      require(!det.contains(dep), s"dependent $dep inside its own determinant")
      val groups = df
        .groupBy((det :+ dep).map(col): _*).agg(count(lit(1)).as("_n"))
        .groupBy(det.map(col): _*).agg(count(lit(1)).as("_vals"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("_vals") > 1L, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_groups"))
        .select(lit(det.mkString(",")).as("determinant"),
          lit(dep).as("dependent"), col("n_groups"),
          col("n_violating_groups"),
          (col("n_violating_groups") === 0L).as("holds"))
    }.reduce(_ unionByName _)
      .orderBy("determinant", "dependent")
  }

  /** `(groupCols…, col_name, n, n_null, n_distinct, vmin, vmax)` — one row
    * per profiled numeric column per group, all columns profiled in ONE
    * scan and unpivoted from the single result row per group.
    * `n_distinct` is exact (nulls excluded); multiple exact distincts
    * make Catalyst Expand the input ×(columns+1) — linear, one scan,
    * but at 100 TB swap in `approx_count_distinct` (HLL, no Expand) per
    * the q57/q93 pattern when exactness stops paying. vmin/vmax are the
    * raw values cast to double, untouched by arithmetic. */
  def summary(
      df: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String]
  ): DataFrame = {
    require(valueCols.nonEmpty, "at least one column to profile")
    val aggs = count(lit(1)).as("_n") +: valueCols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null$i"),
        countDistinct(col(c)).as(s"_nd$i"),
        min(col(c)).cast("double").as(s"_min$i"),
        max(col(c)).cast("double").as(s"_max$i"))
    }
    val one = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val kvs = valueCols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"_null$i").as("n_null"),
        col(s"_nd$i").as("n_distinct"), col(s"_min$i").as("vmin"),
        col(s"_max$i").as("vmax"))
    }
    one.select(groupCols.map(col) ++ Seq(col("_n"), explode(array(kvs: _*)).as("kv")): _*)
      .select(groupCols.map(col) ++ Seq(col("kv.col_name").as("col_name"),
        col("_n").as("n"), col("kv.n_null").as("n_null"),
        col("kv.n_distinct").as("n_distinct"),
        col("kv.vmin").as("vmin"), col("kv.vmax").as("vmax")): _*)
      .orderBy(groupCols.map(col) :+ col("col_name"): _*)
  }

  /** ONE-WAY ANOVA EFFECT STRENGTH (η²) per categorical feature: how
    * much of an integer metric's variance each dimension explains —
    * η² = SS_between/SS_total — the "which slice matters" screen run
    * before any segmented readout (an η² ≈ 0 dimension does not deserve
    * a dashboard tab). All moments are exact integers in DECIMAL(38,0);
    * the one quantization is per-group S_g² DIV n_g (truncating,
    * identical in both engines, error < 1 metric-unit² per group —
    * noise at cent scale), and the final ratio cross-multiplies:
    *     η²_pm = 10⁴·(n·Σ_g(S_g² DIV n_g) − S²) DIV (n·Σy² − S²)
    * clamped at 0 (group truncation can push an η² ≈ 0 numerator a hair
    * negative). Exactness envelope: mean²·n_g must fit a long
    * (< 9.2×10¹⁸ — holds through ~10⁶-unit metrics on ~10⁶-row groups);
    * beyond it the integral division overflows loudly.
    *
    * Scale shape: one grouped aggregate per feature (map-side combined)
    * plus one 1-row moments frame shared across features — the cross
    * joins are scalar. Constant metrics (SS_total = 0) report 0. */
  def effectStrength(
      df: DataFrame,
      valueCol: Column,
      features: Seq[String]
  ): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val big = (c: Column) => c.cast("decimal(38,0)")
    val y = df.select((features.map(col) :+ valueCol.cast("long").as("_y")): _*)
      .localCheckpoint(true) // one source scan feeds every feature pass
    val moments = y.agg(big(count(lit(1))).as("_n"), big(sum(col("_y"))).as("_s"),
      sum(big(col("_y")) * big(col("_y"))).cast("decimal(38,0)").as("_ss"))
    features.map { f =>
      y.groupBy(col(f).cast("string").as("_g"))
        .agg(count(lit(1)).as("_ng"), sum(col("_y")).as("_sg"))
        .agg(count(lit(1)).as("n_groups"),
          sum(expr("CAST(_sg AS DECIMAL(38,0)) * _sg DIV _ng")).as("_aq"))
        .crossJoin(moments) // 1-row x 1-row
        .select(lit(f).as("feature"), col("n_groups"),
          when(expr("_n * _ss - _s * _s") > 0,
            greatest(lit(0L),
              expr("10000 * (_n * CAST(_aq AS DECIMAL(38,0)) - _s * _s)"
                + " DIV (_n * _ss - _s * _s)")))
            .otherwise(0L).as("eta2_pm"))
    }.reduce(_ unionByName _).orderBy(col("feature"))
  }

  /** Benford per-myriad expectations for leading digits 1..9 —
    * round(10⁴·log₁₀(1 + 1/d)); sums to exactly 10⁴. */
  val BenfordPm: Seq[Long] =
    Seq(3010L, 1761L, 1249L, 969L, 792L, 669L, 580L, 512L, 458L)

  /** BENFORD'S-LAW AUDIT: the leading-digit distribution of a positive
    * integer metric against log₁₀(1+1/d) — the forensic data-quality
    * screen for fabricated, truncated, or unit-mangled numeric feeds
    * (organic multi-scale quantities follow Benford; capped, minimum-
    * priced, or invented ones don't). Reported per digit with the χ²₈
    * verdict: the statistic is quantized as
    *     T = Σ_d ((10⁴·O_d − N·p_d)² DIV (N·p_d))   (≈ 10⁴·χ²)
    * — per-digit truncating division, identical in both engines, error
    * < 9 µ-units total — flagged against 10⁴·15.507 (95%, 8 df). The
    * digit comes from the DECIMAL STRING of the value (no float log),
    * zero/negative values are excluded and reported via n_used vs N.
    *
    * Scale shape: one scan to a ≤9-row digit frame (map-side combined);
    * the χ² and totals ride windows on that frame. */
  def benfordAudit(df: DataFrame, valueCol: Column): DataFrame = {
    val big = (c: Column) => c.cast("decimal(38,0)")
    val pm = typedlit(BenfordPm)
    val whole = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val counted = df.select(valueCol.cast("long").as("_v")).filter(col("_v") > 0)
      .select(substring(col("_v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("observed"))
    // all nine digits ALWAYS present: a digit nobody produced still
    // contributes its full N·p χ² term — dropping it would understate T
    df.sparkSession.range(1, 10).select(col("id").as("digit"))
      .join(counted, Seq("digit"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .withColumn("n_used", sum(col("observed")).over(whole))
      .withColumn("expected_pm", element_at(pm, col("digit").cast("int")))
      .withColumn("observed_pm",
        when(col("n_used") > 0, expr("observed * 10000 DIV n_used"))
          .otherwise(0L))
      // per-digit quantized chi-square term in DECIMAL (the square of
      // 10^4·O − N·p overflows long at ~10^5 rows)
      .withColumn("_t", expr(
        "(CAST(observed AS DECIMAL(38,0)) * 10000 - CAST(n_used AS DECIMAL(38,0)) * expected_pm)"))
      .withColumn("chi2_term",
        when(col("n_used") > 0, expr(
          "CAST(_t * _t DIV (CAST(n_used AS DECIMAL(38,0)) * expected_pm) AS BIGINT)"))
          .otherwise(0L))
      .withColumn("chi2_q4", sum(col("chi2_term")).over(whole))
      .withColumn("benford_rejected", col("chi2_q4") > lit(155070L))
      .select("digit", "observed", "n_used", "observed_pm", "expected_pm",
        "chi2_term", "chi2_q4", "benford_rejected")
      .orderBy("digit")
  }

  /** COUNT-DATA DISPERSION INDEX per group: D = s²/ȳ — the
    * overdispersion screen for event counts (Poisson traffic has D ≈ 1;
    * bursty users, bots, and batch re-sends push D ≫ 1; a capped or
    * deduplicated feed pushes D < 1). With integer unit counts the
    * whole statistic is one exact integer ratio:
    *     D_pm = 10⁴·(n·Σy² − S²) DIV ((n−1)·S)
    * (sample variance over mean, cross-multiplied; DECIMAL(38,0)
    * products). Groups with n ≤ 1 or S = 0 report 0 — no variance to
    * speak of, not an error. One aggregate, map-side combined. */
  def dispersionIndex(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      flagAbovePm: Long = 15000L
  ): DataFrame = {
    val big = (c: Column) => c.cast("decimal(38,0)")
    df.select(col(groupCol), col(valueCol).cast("long").as("_y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"),
        sum(col("_y")).as("_s"),
        sum(big(col("_y")) * big(col("_y"))).cast("decimal(38,0)").as("_ss"))
      .withColumn("mean_milli",
        when(col("n_units") > 0, expr("1000 * _s DIV n_units")).otherwise(0L))
      .withColumn("dispersion_pm",
        when(col("n_units") > 1 && col("_s") > 0,
          expr("10000 * (n_units * _ss - CAST(_s AS DECIMAL(38,0)) * _s)"
            + " DIV ((n_units - 1) * CAST(_s AS DECIMAL(38,0)))"))
          .otherwise(0L))
      .withColumn("overdispersed", col("dispersion_pm") > flagAbovePm)
      .select(groupCol, "n_units", "mean_milli", "dispersion_pm", "overdispersed")
      .orderBy(groupCol)
  }

  /** GINI COEFFICIENT of an integer mass distribution per group — the
    * concentration screen ("do 1% of users carry 90% of events?") that
    * decides whether per-user caps or stratified sampling are needed.
    * Computed WITHOUT a data-sized sort via the counting-sort identity:
    * for each distinct value v with count c starting after cumulative
    * count k, its members occupy ranks k+1..k+c, contributing
    * v·(c·k + c·(c+1)/2) to T = Σ rank·y_(asc); then
    *     G = (2T − (n+1)·S) / (n·S)
    * — every term an exact integer, the window runs on the per-group
    * VALUE-DOMAIN frame (q129 discipline). G ∈ [0, 1): 0 = perfectly
    * even, → 1 = all mass on one unit. Zero-mass groups report 0. */
  def giniIndex(
      df: DataFrame,
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val big = (c: Column) => c.cast("decimal(38,0)")
    val counts = df.select(col(groupCol).as("_g"), col(valueCol).cast("long").as("_y"))
      .filter(col("_y") >= 0)
      .groupBy(col("_g"), col("_y")).agg(count(lit(1)).as("_c"))
    val byG = Window.partitionBy(col("_g"))
    val cum = counts.withColumn("_k",
      coalesce(sum(col("_c")).over(byG.orderBy(col("_y"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // accumulate 2T directly — 2·Σ rank·y = Σ y·(2ck + c(c+1)) — so no
    // division (exact or otherwise) happens before the final ratio
    cum.groupBy(col("_g"))
      .agg(sum(col("_c")).as("n_units"),
        sum(col("_y") * col("_c")).as("total"),
        sum(big(col("_y")) * (big(lit(2L)) * big(col("_c")) * col("_k")
          + big(col("_c")) * (col("_c") + 1))).cast("decimal(38,0)").as("_t2"))
      .withColumn("gini_pm",
        when(col("total") > 0,
          expr("10000 * (_t2 - (CAST(n_units AS DECIMAL(38,0)) + 1) * total)"
            + " DIV (CAST(n_units AS DECIMAL(38,0)) * total)"))
          .otherwise(0L))
      .select(col("_g").as(groupCol), col("n_units"), col("total"), col("gini_pm"))
      .orderBy(groupCol)
  }

  /** POWER-LAW TAIL SCREEN — survival-count ratios at doubling
    * thresholds. For a value distribution (user activity, degree,
    * doc length), report S(k) = #{units : value ≥ k} at k = k₀·2^j and
    * the doubling ratio
    *
    *     ratio_pm = 1000·S(2k) DIV S(k)
    *
    * A Pareto tail with index α shows a FLAT ratio column (≈ 2^(−α)·1000
    * at every doubling — e.g. α = 1 ⇒ ~500 pm); exponential-ish tails
    * show ratios collapsing toward 0 as k grows. The log-free,
    * integer-exact replacement for a log-log regression — the screen
    * that decides whether heavy-hitter machinery (salting, skew joins,
    * per-user caps) is needed at all.
    *
    * One aggregate over the input computes every survival count as a
    * conditional sum (no per-threshold scan); the ≤`doublings`+1-row
    * readout assembles from that single row.
    *
    * @param df        one row per unit
    * @param valueCol  integral nonneg value per unit
    * @param k0        smallest threshold (≥ 1)
    * @param doublings number of doublings to probe (output rows − 1)
    * @return per threshold: k, survivors, ratio_pm (survivors here vs
    *         at the previous threshold; NULL on the first row and when
    *         the previous count is 0), n_units crossed in
    */
  /** HILL TAIL-INDEX ESTIMATE over the top-k order statistics — the
    * quantitative companion to [[tailRatios]]: with x₍₁₎ ≥ … ≥ x₍ₖ₎ the
    * k largest values (ties at the boundary truncated deterministically
    * by count),
    *
    *     H = (Σᵢ L(xᵢ) − k·L(x₍ₖ₎)) DIV k,   L(v) = ⌊ln(v)·10⁶ + ½⌋
    *     alpha_ppm = 10¹² DIV H                (NULL when H = 0)
    *
    * — the classic 1/α̂ = mean ln(xᵢ/x₍ₖ₎), per-value quantized to
    * micro-nats first (the q70 construction) so the estimate is
    * bit-identical across engines. α̂ ≈ 1 reads "extremely heavy"
    * (Zipf-like), α̂ ≥ 3-4 reads "tail too thin to matter".
    *
    * Selection never sorts the data: the top-k set is found by
    * cumulative counts on the DISTINCT-value frame (counting-sort
    * discipline), bounded by value cardinality.
    *
    * @param df       one row per unit
    * @param valueCol integral value ≥ 1 per unit (rows < 1 are ignored
    *                 — ln needs a positive domain)
    * @param k        requested tail size (≥ 2); the reported `k` is
    *                 min(k, units) — a dataset smaller than k estimates
    *                 on everything it has rather than failing
    * @return 1 row: n_units, k, x_k, h_micronats, alpha_ppm
    */
  def hillTailIndex(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val vals = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v") >= 1L)
      .groupBy("v").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // top-k selection + the unit total: one scan
    val fromTop = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = vals.withColumn("s", sum(col("c")).over(fromTop))
      .withColumn("above", col("s") - col("c"))
      .withColumn("take",
        greatest(lit(0L), least(col("c"), lit(k.toLong) - col("above"))))
      .filter(col("take") > 0)
      .withColumn("lv", expr("CAST(floor(ln(CAST(v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
    cum.agg(sum(col("take") * col("lv")).as("t"),
        sum(col("take")).cast("long").as("kk"),
        min(col("v")).as("x_k"))
      .crossJoin(vals.agg(sum(col("c")).cast("long").as("n_units")))
      .withColumn("lk", expr("CAST(floor(ln(CAST(x_k AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"))
      .withColumn("h_micronats", expr("(t - kk * lk) DIV kk"))
      .withColumn("alpha_ppm", expr(
        "CASE WHEN h_micronats > 0 THEN 1000000000000 DIV h_micronats END"))
      .select(col("n_units"), col("kk").as("k"), col("x_k"),
        col("h_micronats"), col("alpha_ppm"))
  }

  def tailRatios(df: DataFrame, valueCol: String, k0: Long, doublings: Int): DataFrame = {
    require(k0 >= 1 && doublings >= 1, s"bad tail spec k0=$k0 x$doublings")
    val ks = (0 to doublings).map(j => k0 << j)
    val v = col(valueCol).cast("long")
    val aggCols = count(lit(1)).cast("long").as("n_units") +:
      ks.zipWithIndex.map { case (k, j) =>
        sum(when(v >= k, 1L).otherwise(0L)).as(s"s$j") }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
      .localCheckpoint(true) // 1 row, read once per threshold row
    val rows = ks.zipWithIndex.map { case (k, j) =>
      val prev = if (j == 0) lit(null).cast("long")
        else expr(s"CASE WHEN s${j - 1} > 0 THEN (1000 * s$j) DIV s${j - 1} END")
      one.select(lit(k).as("k"), col(s"s$j").as("survivors"),
        prev.as("ratio_pm"), col("n_units"))
    }
    rows.reduce(_ unionByName _).orderBy("k")
  }

  /** DEDUP IMPACT LEDGER — "how much data do we ACTUALLY have?": per
    * source, raw vs surviving documents and tokens after global exact
    * dedup (canonical fingerprint, min-doc_id survivor — the q20/q42
    * rule). Dedup is GLOBAL: a doc whose fingerprint first appeared
    * under another source dies here and its tokens leave THIS source's
    * effective count — which is exactly the cross-source contamination
    * a per-source distinct would hide. The keep ratios are what a
    * training-data budget should be quoted in; raw token counts
    * overstate corpora with heavy syndication.
    *
    * Scale shape: one tokenize+fingerprint scan (projection), one
    * fingerprint-keyed aggregate for survivor election (16-byte keys —
    * the q20 shuffle), a LEFT SEMI back-join on (fingerprint, doc),
    * and a source-sized rollup. All integer counts; ratios one
    * truncating DIV each.
    */
  def dedupImpact(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String): DataFrame = {
    import graft.functions.TextAnalysis
    val base = docs.select(col(sourceCol).as("source"),
        col(idCol).as("doc_id"),
        TextAnalysis.canonicalFingerprint(col(textCol)).as("fp"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok"))
      .localCheckpoint(true) // narrow; survivor election + rollup share it
    val survivors = base.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    base
      .join(survivors, Seq("fp", "doc_id"), "left_semi")
      .groupBy("source")
      .agg(count(lit(1)).as("surv_docs"), sum(col("n_tok")).as("surv_toks"))
      .join(base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_toks")),
        Seq("source"), "right")
      .withColumn("surv_docs", coalesce(col("surv_docs"), lit(0L)))
      .withColumn("surv_toks", coalesce(col("surv_toks"), lit(0L)))
      .withColumn("doc_keep_pm", expr("(10000 * surv_docs) DIV n_docs"))
      .withColumn("tok_keep_pm",
        when(col("n_toks") > 0, expr("(10000 * surv_toks) DIV n_toks"))
          .otherwise(10000L))
      .select("source", "n_docs", "n_toks", "surv_docs", "surv_toks",
        "doc_keep_pm", "tok_keep_pm")
      .orderBy("source")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AUDIENCE SET ALGEBRA — the segment-overlap readout ClickHouse serves
  * with `groupBitmap` bitmaps, re-expressed as ONE aggregate pass.
  *
  * Per user, a 0/1 flag per audience (conditional max — the membership
  * "bitmap" as columns); then every |A|, |B| and |A∩B| for all pairs is
  * a plain integer sum over the flags frame, computed in a SINGLE
  * aggregate (no per-pair scan, no distinct per segment). Union and
  * Jaccard follow by inclusion–exclusion — exact, order-free integers.
  *
  * The two stages are public because the flags frame is STREAMING
  * STATE: `membershipFlags` is a plain streaming-safe aggregation
  * (max merges monotonically across micro-batches), so a live segment
  * store maintains it incrementally and [[overlapFromFlags]] finishes
  * from the stored state — the StreamingSpec twin pins stream ≡ batch.
  *
  * Scale shape: one user-keyed count-shuffle builds the flags frame
  * (map-side combined — the event log collapses before the exchange);
  * the m·(m+1)/2 sums ride one aggregate over it; the output assembles
  * from a 1-row frame. m = audience count, a constant — the m² term
  * lives in COLUMNS, never in rows.
  */
object Audience {

  /** TOP-K TURNOVER — how stable is the head of the distribution?
    * Rank entities per period by activity (count desc, id asc — total
    * order), keep the top k, and compare consecutive periods: stayers,
    * entrants, exits, and the Jaccard of the two head sets. A head
    * that churns completely every period means "top users" dashboards
    * are noise; one that never changes means the platform has whales.
    *
    * Scale shape: one (period, entity) aggregate over the log, a
    * period-partitioned rank window (top-k per period — k rows
    * survive), then a self-join of the (periods × k)-sized head table
    * on (entity, period+1). Integer counts, one truncating DIV for
    * the Jaccard.
    *
    * @return per consecutive-period boundary: week (earlier period),
    *         n_prev, n_next, n_stay, n_enter, n_exit, jaccard_pm
    */
  def topKTurnover(df: org.apache.spark.sql.DataFrame, entityCol: String,
      periodCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(periodCol).as("w"), col(entityCol).as("e"))
      .agg(count(lit(1)).as("n"))
    val wr = Window.partitionBy("w").orderBy(col("n").desc, col("e").asc)
    val top = counts.withColumn("r", row_number().over(wr))
      .filter(col("r") <= k)
      .select("w", "e")
      .localCheckpoint(true) // periods × k rows; three consumers below
    val sizes = top.groupBy("w").agg(count(lit(1)).as("kn"))
    val stay = top.as("a")
      .join(top.as("b"),
        col("a.e") === col("b.e") && col("b.w") === col("a.w") + 1)
      .groupBy(col("a.w").as("w"))
      .agg(count(lit(1)).as("n_stay"))
    sizes.select(col("w"), col("kn").as("n_prev"))
      .join(sizes.select((col("w") - 1).as("w"), col("kn").as("n_next")), "w")
      .join(stay, Seq("w"), "left")
      .withColumn("n_stay", coalesce(col("n_stay"), lit(0L)))
      .withColumn("n_enter", col("n_next") - col("n_stay"))
      .withColumn("n_exit", col("n_prev") - col("n_stay"))
      .withColumn("jaccard_pm",
        expr("(10000 * n_stay) DIV (n_prev + n_next - n_stay)"))
      .select(col("w").as("week"), col("n_prev"), col("n_next"),
        col("n_stay"), col("n_enter"), col("n_exit"), col("jaccard_pm"))
      .orderBy("week")
  }

  /** Stage 1: per-user 0/1 membership flags `(userCol, f0..f(m−1))` —
    * fᵢ = 1 iff the user has any `types(i)` event. A streaming-safe
    * max-aggregation (complete/update modes both merge it exactly). */
  def membershipFlags(df: DataFrame, userCol: String, typeCol: String,
      types: Seq[String]): DataFrame = {
    require(types.size >= 2 && types.distinct == types,
      s"need >= 2 distinct audience types, got $types")
    val flagCols = types.zipWithIndex.map { case (t, i) =>
      max(when(col(typeCol) === t, 1L).otherwise(0L)).as(s"f$i") }
    df.groupBy(col(userCol)).agg(flagCols.head, flagCols.tail: _*)
  }

  /** Stage 2: the pair matrix off an existing flags frame (stored,
    * streamed, or fresh from [[membershipFlags]]).
    *
    * @return one row per unordered pair (a < b): type_a, type_b, n_a,
    *         n_b, n_both, n_any, jaccard_pm (NULL when the union is
    *         empty), n_users crossed in
    */
  def overlapFromFlags(flags: DataFrame, types: Seq[String]): DataFrame = {
    require(types.size >= 2 && types.distinct == types,
      s"need >= 2 distinct audience types, got $types")
    val singles = types.indices.map(i => sum(col(s"f$i")).as(s"n$i"))
    val pairs = for {
      i <- types.indices; j <- types.indices if i < j
    } yield sum(col(s"f$i") * col(s"f$j")).as(s"i${i}_$j")
    val aggCols = count(lit(1)).cast("long").as("n_users") +: (singles ++ pairs)
    val one = flags.agg(aggCols.head, aggCols.tail: _*)
      .localCheckpoint(true) // 1 row, one select per pair below
    val rows = for {
      i <- types.indices; j <- types.indices if i < j
    } yield one.select(
      lit(types(i)).as("type_a"), lit(types(j)).as("type_b"),
      col(s"n$i").cast("long").as("n_a"), col(s"n$j").cast("long").as("n_b"),
      col(s"i${i}_$j").cast("long").as("n_both"),
      (col(s"n$i") + col(s"n$j") - col(s"i${i}_$j")).cast("long").as("n_any"),
      expr(s"CASE WHEN n$i + n$j - i${i}_$j > 0 " +
        s"THEN (1000 * i${i}_$j) DIV (n$i + n$j - i${i}_$j) END").as("jaccard_pm"),
      col("n_users"))
    rows.reduce(_ unionByName _).orderBy("type_a", "type_b")
  }

  /** The one-shot composition: events → flags → pair matrix. */
  def overlapMatrix(df: DataFrame, userCol: String, typeCol: String,
      types: Seq[String]): DataFrame =
    overlapFromFlags(membershipFlags(df, userCol, typeCol, types), types)

  /** RFM SEGMENTATION — the classic recency/frequency/monetary audience
    * grid: per entity, days since last qualifying event (R), qualifying
    * event count (F), and value total (M), each scored 1..5 by QUINTILE
    * — computed the COUNTING way (the q129/thresholdSweep discipline):
    * each metric collapses to its distinct-value cell frame, the
    * cumulative histogram positions every cell, and
    *
    *     score = 1 + (5 · cum_before) DIV total      (capped at 5)
    *
    * so ties share one score, no entity-sized frame is ever globally
    * ranked (a plain ntile would move every entity to one partition —
    * the named scale-killer), and the whole scoring pass is three
    * value-domain-bounded windows plus broadcast joins back. R scores
    * INVERT (recent = 5): the cell frame orders days-since ascending
    * and scores 6 − q.
    *
    * @return one row per populated segment: (r_score, f_score, m_score,
    *         n_entities, value_cents) ordered by the triple
    */
  def rfmSegments(df: DataFrame, entityCol: String, dayCol: String,
                  valueCentsCol: String): DataFrame = {
    val agg = df
      .groupBy(col(entityCol).as("e"))
      .agg(max(col(dayCol).cast("long")).as("last_day"),
        count(lit(1)).as("f"),
        sum(col(valueCentsCol).cast("long")).as("m"))
    // anchor day as a 1-row scalar crossJoin (the q84 pattern), NOT a
    // global window over the entity frame
    val per = agg
      .crossJoin(agg.agg(max(col("last_day")).as("_h")))
      .withColumn("r", col("_h") - col("last_day"))
      // monetary scores at DOLLAR grain: per-entity cent totals are
      // near-unique, so their cell frame would be entity-sized — the
      // thresholdSweep convention (quantize continuous metrics first)
      // keeps every scoring window domain-bounded
      .withColumn("m_cell", expr("m DIV 100"))
      .drop("_h")
      .localCheckpoint(true) // three metric censuses + the final join

    // counting-quantile score for one metric: cells -> cumulative
    // position -> 1..5. `asc = false` inverts (low value = high score).
    def scoreOf(metric: String, asc: Boolean): DataFrame = {
      val cells = per.groupBy(col(metric).as("v"))
        .agg(count(lit(1)).as("n"))
      val ord = if (asc) col("v").asc else col("v").desc
      val wCum = Window.orderBy(ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy(ord)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      cells
        .withColumn("cb", sum(col("n")).over(wCum) - col("n"))
        .withColumn("tot", sum(col("n")).over(wAll))
        .select(col("v"),
          expr("least(5L, 1 + (5 * cb) DIV tot)").as(s"${metric}_score".replace("_cell", "")))
    }
    per
      .join(broadcast(scoreOf("r", asc = false)
        .withColumnRenamed("v", "r")), "r")
      .join(broadcast(scoreOf("f", asc = true)
        .withColumnRenamed("v", "f")), "f")
      .join(broadcast(scoreOf("m_cell", asc = true)
        .withColumnRenamed("v", "m_cell")), "m_cell")
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_entities"),
        sum(col("m")).as("value_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }
}

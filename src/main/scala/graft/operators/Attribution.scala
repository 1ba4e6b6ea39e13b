package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MARKETING-TOUCH ATTRIBUTION: for every conversion event, the touch
  * events of the same user in the trailing lookback window — count,
  * first touch (the "first-touch attribution" winner), and last touch
  * with its event id (the "last-touch attribution" winner). The
  * warehouse-side join that answers "which click gets credit for this
  * purchase", kept deterministic: touches strictly BEFORE the conversion
  * millisecond qualify (a same-millisecond touch is not credited), and
  * equal-timestamp touches tie-break on the larger event id via a
  * lexicographic (ms, id) `max_by`.
  *
  * Spark-first shape: NOT an inequality join (O(|touch|·|conv|) BNLJ).
  * Touches and conversions ride ONE per-user range-frame window over
  * integer milliseconds — one shuffle on the user key, one in-partition
  * sort, every aggregate computed in the same frame pass. Conversions
  * with zero in-window touches survive with nulls (left-join semantics:
  * the un-attributed conversion is the row an attribution report most
  * needs to see).
  */
object Attribution {

  /** `(event_id, user_id, conv_ms, n_touches, first_touch_ms,
    * last_touch_ms, last_touch_id)` — one row per conversion event. */
  def touchAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      touchType: String,
      conversionType: String,
      lookbackMs: Long
  ): DataFrame = {
    require(lookbackMs > 0, "lookbackMs must be positive")
    require(touchType != conversionType, "touch and conversion types must differ")
    val e = events
      .select(col(userCol).as("user_id"), unix_millis(col(tsCol)).as("ms"),
        col(typeCol).as("etype"), col(idCol).as("event_id"))
      .filter(col("user_id").isNotNull &&
        (col("etype") === touchType || col("etype") === conversionType))
      .withColumn("is_touch", col("etype") === lit(touchType))
    val w = Window.partitionBy("user_id").orderBy(col("ms").asc)
      .rangeBetween(-lookbackMs, -1L)
    val touchMs = when(col("is_touch"), col("ms"))
    e.withColumn("n_touches", count(touchMs).over(w))
      .withColumn("first_touch_ms", min(touchMs).over(w))
      .withColumn("last_touch_ms", max(touchMs).over(w))
      .withColumn("last_touch_id",
        max_by(when(col("is_touch"), col("event_id")),
          when(col("is_touch"), struct(col("ms"), col("event_id")))).over(w))
      .filter(!col("is_touch"))
      .select(col("event_id"), col("user_id"), col("ms").as("conv_ms"),
        col("n_touches"), col("first_touch_ms"), col("last_touch_ms"),
        col("last_touch_id"))
  }

  /** floor(2^(−d/7)·10⁶) for whole-day ages d = 0..30 — the 7-day
    * half-life decay weights, PINNED so Spark and the oracle share one
    * literal table (the RankEval.DiscountMicro discipline: compute the
    * transcendental once at code-authoring time, never at query time). */
  val DecayMicro: IndexedSeq[Long] =
    (0 to 30).map(d => math.floor(math.pow(2.0, -d / 7.0) * 1e6).toLong)

  /** ATTRIBUTION MODEL COMPARISON — per channel, conversion credit
    * under the five standard position/recency models side by side
    * (first-touch, last-touch, linear, U-shaped 40/20/40, 7-day-half-
    * life time decay). Channel teams argue about models; this dossier
    * shows how much the CHOICE moves each channel's credit — on one
    * deterministic frame, so the spread is the readout.
    *
    * Per conversion, its lookback touches rank by (ms, id); credits:
    *   - linear: 10⁶ DIV n per touch
    *   - U-shape: n=1→10⁶; n=2→500000 each; else 400000 to the ends,
    *     200000 DIV (n−2) to each middle
    *   - decay: w = DecayMicro(age days), share = 10⁶·w DIV Σw
    * Every division truncates; sums add truncated terms (defined
    * semantics, oracle-replayed).
    *
    * Scale shape: the touch↔conversion pairing co-locates on
    * (user, lookback-sized time bucket) — each touch explodes to the
    * ≤2 buckets whose conversions can see it (the q86 funnel
    * discipline), so a hyperactive user never produces a quadratic
    * join. Ranks partition per conversion (lookback-bounded frames);
    * the final aggregate is channel-sized.
    */
  def modelComparison(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      lookbackMs: Long
  ): DataFrame = {
    require(lookbackMs > 0, "lookbackMs must be positive")
    val e = events.select(col(userCol).as("u"), unix_millis(col(tsCol)).as("ms"),
      col(typeCol).as("etype"), col(idCol).as("eid"))
    val convs = e.filter(col("etype") === conversionType)
      .select(col("u"), col("ms").as("cms"), col("eid").as("cid"),
        expr(s"ms DIV $lookbackMs").as("bkt"))
    val touches = e.filter(col("etype") =!= conversionType)
      .select(col("u"), col("ms").as("tms"), col("etype"), col("eid").as("tid"),
        explode(array(expr(s"ms DIV $lookbackMs"),
          expr(s"ms DIV $lookbackMs + 1"))).as("bkt"))
    val pairs = convs.join(touches, Seq("u", "bkt"))
      .filter(col("tms") >= col("cms") - lookbackMs && col("tms") < col("cms"))
    val wRank = Window.partitionBy("u", "cid")
      .orderBy(col("tms").asc, col("tid").asc)
    val wConv = Window.partitionBy("u", "cid")
    val decay = typedlit(DecayMicro)
    val ranked = pairs
      .withColumn("idx", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wConv))
      .withColumn("w", element_at(decay,
        least(expr("(cms - tms) DIV 86400000"),
          lit(DecayMicro.size.toLong - 1L)).cast("int") + 1))
      .withColumn("sumw", sum(col("w")).over(wConv))
    ranked
      .withColumn("linear", expr("1000000 DIV n"))
      .withColumn("ushape", expr(
        """CASE WHEN n = 1 THEN 1000000
          |  WHEN n = 2 THEN 500000
          |  WHEN idx = 1 OR idx = n THEN 400000
          |  ELSE 200000 DIV (n - 2) END""".stripMargin))
      .withColumn("share", expr("(1000000 * w) DIV sumw"))
      .groupBy(col("etype").as("channel"))
      .agg(
        sum(when(col("idx") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("idx") === col("n"), 1L).otherwise(0L)).as("n_last"),
        sum(col("linear")).as("linear_micro"),
        sum(col("ushape")).as("ushape_micro"),
        sum(col("share")).as("decay_micro"))
      .orderBy("channel")
  }
}

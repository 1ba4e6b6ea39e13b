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
}

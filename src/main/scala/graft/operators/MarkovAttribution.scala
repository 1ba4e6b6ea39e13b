package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. '14 — the
  * data-driven alternative to last/first-touch): model user journeys as
  * a first-order Markov chain over channels with absorbing CONV/NULL
  * states, and credit each channel by its REMOVAL EFFECT — how much
  * conversion probability disappears when every transition INTO the
  * channel is redirected to NULL. A channel that merely appears on
  * converting paths earns nothing if journeys route around it; one that
  * bridges otherwise-dead paths earns a lot. Complements q96's rule-
  * based touch attribution with the model-based answer.
  *
  * Journey construction (engine-replayable, all from the q39/q110
  * session CTEs): per session, steps in (ms, event_id) order, truncated
  * at the FIRST conversion event — the step before it transitions to
  * CONV; a session with no conversion ends in NULL; a session whose
  * first event converts contributes START→CONV. Conversion events are
  * never sources.
  *
  * The metric is the K-STEP conversion probability v_K(START) — the
  * probability of absorbing in CONV within K transitions — computed by
  * integer-scaled value iteration (scale 10¹²): v_{k+1}(s) =
  * Σ_t cnt(s,t)·v_k(t) DIV out(s), truncating division each step, so
  * the number is bit-identical on any engine (the q107/q120 discipline;
  * no linear solve, no floats, and the K-step semantics are exact — not
  * an "approximation" of the stationary answer).
  *
  * Scale shape: the ONLY data-sized work is sessionized edge counting
  * (windows partitioned by session, then one aggregate onto the
  * |channels|²-bounded transition matrix). The matrix is collected —
  * a DOMAIN-bounded frame, ≤ (|vocabulary|+3)² rows, the adjudicated
  * bounded-collect pattern — and (1 + |channels|) value iterations run
  * in exact BigInt on the driver, each over ≤ a few dozen integers. */
object MarkovAttribution {

  val Scale: Long = 1000000000000L // 10^12: v is a scaled probability

  /** @param convType the absorbing conversion event type
    * @param iters    K, the step horizon of v_K(START)
    * @param maxStates guard for the bounded collect: distinct states
    *                 must stay under this (vocabulary-bounded by design)
    * @return one row per channel plus the '(none)' baseline:
    *         channel, p_q12 (v_K(START), scale 10¹², with that channel
    *         removed; baseline for '(none)'), removal_pm */
  def removalEffects(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      convType: String,
      gapMs: Long = 30L * 60000L,
      iters: Int = 16,
      maxStates: Int = 64
  ): DataFrame = {
    val spark = events.sparkSession
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ms").asc, col("eid").asc)
    val steps = Paths.sessionized(events, userCol, tsCol, typeCol, idCol, gapMs)
      .withColumn("pos", row_number().over(bySession))
    // first conversion position per session; steps at/after it drop
    val convPos = steps.filter(col("etype") === convType)
      .groupBy("user_id", "session_id").agg(min(col("pos")).as("ppos"))
    val kept = steps.join(convPos, Seq("user_id", "session_id"), "left")
      .filter(col("ppos").isNull || col("pos") < col("ppos"))
    val withNext = kept.withColumn("nxt", lead(col("etype"), 1).over(bySession))
    val internal = withNext.select(col("etype").as("src"),
      coalesce(col("nxt"),
        when(col("ppos").isNotNull, lit("CONV")).otherwise(lit("NULL"))).as("dst"))
    val starts = withNext.filter(col("pos") === 1)
      .select(lit("START").as("src"), col("etype").as("dst"))
    val directConv = convPos.filter(col("ppos") === 1)
      .select(lit("START").as("src"), lit("CONV").as("dst"))
    val edges = internal.unionByName(starts).unionByName(directConv)
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))

    // ---- bounded collect: the |states|²-capped transition matrix ----
    // LIMIT the collect itself so a high-cardinality channel column
    // (the misuse this guard exists for) fails loudly on a bounded
    // driver buffer instead of OOMing before the check runs
    val capRows = maxStates * maxStates
    val rows = edges.limit(capRows + 1).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    require(rows.length <= capRows && states.length <= maxStates,
      s"state space ${states.length}+ (≥${rows.length} edges) exceeds " +
        s"maxStates=$maxStates — removal attribution needs a " +
        "vocabulary-bounded channel set")
    val out = rows.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val bySrc = rows.groupBy(_._1)

    def vK(removed: Option[String]): BigInt = {
      var v: Map[String, BigInt] =
        states.map(s => s -> (if (s == "CONV") BigInt(Scale) else BigInt(0))).toMap
      for (_ <- 1 to iters) {
        v = states.map { s =>
          s -> (if (s == "CONV") BigInt(Scale)
          else bySrc.get(s) match {
            case None => BigInt(0) // NULL and never-source states
            case Some(es) =>
              val num = es.iterator
                .filterNot(e => removed.contains(e._2))
                .map(e => BigInt(e._3) * v(e._2)).sum
              num / BigInt(out(s)) // trunc: both operands non-negative
          })
        }.toMap
      }
      v.getOrElse("START", BigInt(0))
    }

    val base = vK(None)
    val channels = states.filterNot(Set("START", "CONV", "NULL"))
    val result = (("(none)", base) +: channels.map(c => (c, vK(Some(c)))))
      .map { case (c, p) =>
        val removalPm =
          if (c == "(none)" || base == 0) 0L
          else (BigInt(10000) * (base - p) / base).toLong
        Row(c, p.toLong, removalPm)
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(result.toSeq, 1),
      StructType(Seq(
        StructField("channel", StringType, nullable = false),
        StructField("p_q12", LongType, nullable = false),
        StructField("removal_pm", LongType, nullable = false))))
      .orderBy("channel")
  }
}

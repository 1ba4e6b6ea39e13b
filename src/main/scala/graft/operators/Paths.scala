package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CLICKSTREAM PATH MINING over sessionized events: the first-order
  * MARKOV TRANSITION matrix ("after a view, what happens next — and with
  * what probability") and the TOP N-STEP PATHS ("which three-step flows
  * dominate") — the two readouts a funnel designer and a next-event
  * model both start from. Transitions never cross a session boundary:
  * a purchase ending one visit does not "lead to" the click opening the
  * next one three days later.
  *
  * Sessionization is the q39 construction (gap > `gapMs` opens a new
  * session) so paths and session stats can never disagree on where a
  * session starts. All outputs are exact integers: probabilities are
  * per-myriad via integer div.
  *
  * Scale shape: one shuffle on the user key drives the session window,
  * the lag/lead chain, and the n-gram assembly (all same partitioning —
  * Spark reuses the exchange); the count tables after it are
  * event-type^n sized. The path window (rank over counts) orders a
  * bounded table, same class as the q95 merge-rank window. */
object Paths {

  /** `(user_id, ms, etype, eid, new_session, session_id)` — the q39
    * session construction (gap > `gapMs` opens a session), public so
    * downstream consumers ([[Assoc]] transactions, the path queries)
    * share EXACTLY one definition of where a session starts. */
  def sessionized(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, gapMs: Long = 30L * 60000L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ms").asc, col("eid").asc)
    events
      .select(col(userCol).as("user_id"), unix_millis(col(tsCol)).as("ms"),
        col(typeCol).as("etype"), col(idCol).as("eid"))
      .withColumn("new_session",
        when(lag(col("ms"), 1).over(byUser).isNull ||
          (col("ms") - lag(col("ms"), 1).over(byUser)) > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** `(from_type, to_type, n, p_pmyriad)` — within-session consecutive
    * event-type pairs; p is row-normalized (out of all transitions
    * LEAVING from_type), integer per-myriad. */
  def transitions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      gapMs: Long = 30L * 60000L
  ): DataFrame = {
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ms").asc, col("eid").asc)
    val pairs = sessionized(events, userCol, tsCol, typeCol, idCol, gapMs)
      .withColumn("to_type", lead(col("etype"), 1).over(bySession))
      .filter(col("to_type").isNotNull)
      .groupBy(col("etype").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    // row-normalizing total: a window over the event-type^2-sized table
    pairs
      .withColumn("row_total", sum(col("n")).over(Window.partitionBy("from_type")))
      .withColumn("p_pmyriad", expr("n * 10000 DIV row_total"))
      .select("from_type", "to_type", "n", "p_pmyriad")
  }

  /** `(etype, n_dwells, total_ms, mean_ms, max_ms)` — DWELL TIME per
    * event type: the gap to the NEXT event within the same session,
    * attributed to the event the user was "on" (the product-analytics
    * "time on step"). A session's last event has no next and contributes
    * no dwell; cross-session gaps never count (the user left). All
    * integer milliseconds, mean via integer DIV.
    *
    * Scale shape: the same single user-key exchange as [[transitions]]
    * drives the session window and the lead; the aggregate output is
    * event-type-sized. */
  def dwellTimes(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      gapMs: Long = 30L * 60000L
  ): DataFrame = {
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ms").asc, col("eid").asc)
    sessionized(events, userCol, tsCol, typeCol, idCol, gapMs)
      .withColumn("dwell", lead(col("ms"), 1).over(bySession) - col("ms"))
      .filter(col("dwell").isNotNull)
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n_dwells"),
        sum(col("dwell")).as("total_ms"),
        expr("sum(dwell) DIV count(1)").as("mean_ms"),
        max(col("dwell")).as("max_ms"))
      .orderBy("etype")
  }

  /** `(path, n, path_rank)` — the `steps`-long within-session event-type
    * n-grams, top `topK` by count (ties broken by path string). */
  def topPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      steps: Int = 3,
      topK: Int = 20,
      gapMs: Long = 30L * 60000L
  ): DataFrame = {
    require(steps >= 2 && topK > 0, s"need steps >= 2 and positive topK")
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ms").asc, col("eid").asc)
    val withSteps = (1 until steps).foldLeft(
      sessionized(events, userCol, tsCol, typeCol, idCol, gapMs)) {
      case (df, i) => df.withColumn(s"__s$i", lead(col("etype"), i).over(bySession))
    }
    val pathCol = concat_ws(" > ",
      col("etype") +: (1 until steps).map(i => col(s"__s$i")): _*)
    val counts = withSteps
      .filter((1 until steps).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .groupBy(pathCol.as("path"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("path_rank",
        row_number().over(Window.orderBy(col("n").desc, col("path").asc)))
      .filter(col("path_rank") <= topK)
  }

  /** ORDERED-SUBSEQUENCE MATCH (the ClickHouse `sequenceMatch('(?1)(?2)…')`
    * shape without time conditions): per user, does the event stream
    * contain `pattern` as a subsequence at strictly increasing
    * millisecond timestamps?
    *
    * The earliest-chain construction — t₁ = first p₁ event, t₂ = first
    * p₂ event after t₁, … — is EXACT here, not a greedy approximation:
    * for unconstrained subsequence existence, taking the earliest
    * feasible event at each step can only enlarge the feasible suffix
    * (exchange argument), so the chain completes iff any match exists.
    * (Contrast [[Funnel.windowFunnel]], where a global window makes
    * earliest-anchor greedy lossy — and
    * [[Funnel.windowFunnelExact]] repairs it by scanning anchors.)
    *
    * Scale shape: one narrow (user, type, ms) projection feeds k
    * pushed-down type filters, each aggregating map-side onto a
    * user-keyed frame; every join is a user-key equi-join on the same
    * shuffle key. k = pattern length, a constant.
    *
    * @return matched users only: (userCol, first_ms, last_ms) — the
    *         chain's endpoints; anti-join against the user ledger for
    *         the unmatched set
    */
  def sequenceMatch(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      pattern: Seq[String]
  ): DataFrame = {
    require(pattern.nonEmpty, "pattern must have at least one step")
    val base = df.select(col(userCol).as("u"), col(typeCol).as("et"),
      unix_millis(col(tsCol)).as("ms"))
    val first = base.filter(col("et") === pattern.head)
      .groupBy("u").agg(min(col("ms")).as("t1"))
    val chain = pattern.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      base.filter(col("et") === step)
        .join(acc, Seq("u"))
        .filter(col("ms") > col(s"t$i"))
        .groupBy(col("u") +: (1 to i).map(j => col(s"t$j")): _*)
        .agg(min(col("ms")).as(s"t${i + 1}"))
    }
    chain.select(col("u").as(userCol), col("t1").as("first_ms"),
        col(s"t${pattern.size}").as("last_ms"))
      .orderBy(userCol)
  }

  /** STATIONARY DISTRIBUTION of the session Markov chain — the
    * long-run share of attention each event type commands if users
    * keep following the observed transition structure, i.e. the
    * PageRank-without-teleport of the behavioral graph. Complements
    * q103 (the one-step matrix) and q218 (one-step prediction) with
    * the infinite-horizon readout.
    *
    * Deterministic integer power iteration: P(i,j) in micro units
    * (one truncating DIV per cell), π₀ uniform (10⁶ DIV k), and each
    * step π'(j) = Σᵢ (πᵢ·P(i,j)) DIV 10⁶ with per-term truncation —
    * the exact trace the oracle's unrolled replay reproduces.
    * Dangling states (incoming but no outgoing transitions) get a
    * self-loop so their mass is conserved, the standard absorbing
    * repair. Truncation bleeds ≤1 micro per term per round; after the
    * pinned 16 rounds the result is a deterministic fixed readout,
    * not a float approximation.
    *
    * Scale shape: ONE session-window pass collapses the log to the
    * event-type²-sized transition matrix; the power iteration runs
    * driver-side on that collected domain-bounded matrix (the
    * pinned-centroid bounded-collect discipline — k event types, not
    * data).
    */
  def stationaryDistribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      iterations: Int = 16,
      gapMs: Long = 30L * 60000L
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 64, "iterations in [1,64]")
    val spark = events.sparkSession
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ms").asc, col("eid").asc)
    val trans = sessionized(events, userCol, tsCol, typeCol, idCol, gapMs)
      .withColumn("to_type", lead(col("etype"), 1).over(bySession))
      .filter(col("to_type").isNotNull)
      .groupBy(col("etype").as("f"), col("to_type").as("t"))
      .agg(count(lit(1)).as("n"))
      .collect() // event-type²-bounded
      .map(r => (r.getAs[String]("f"), r.getAs[String]("t"), r.getAs[Long]("n")))
    val rowTotals = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val froms = rowTotals.keySet
    val states = (froms ++ trans.map(_._2)).toSeq.sorted
    // P cells in micro; dangling states self-loop with full mass
    val p: Map[(String, String), Long] =
      trans.map { case (f, t, n) => (f, t) -> 1000000L * n / rowTotals(f) }
        .toMap ++
        states.filterNot(froms).map(s => (s, s) -> 1000000L)
    var pi: Map[String, Long] =
      states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to iterations) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for (((f, t), pm) <- p; m = pi.getOrElse(f, 0L) * pm / 1000000L)
        next(t) += m
      pi = next.toMap
    }
    import spark.implicits._
    states.flatMap(s => pi.get(s).filter(_ > 0).map(s -> _))
      .toDF("state", "pi_micro")
      .orderBy("state")
  }

  /** OUT-OF-TIME BACKTEST of the first-order Markov next-event model:
    * train the argmax-transition predictor on the first `trainDays` of
    * the corpus, score its top-1 accuracy on everything after — the
    * honest evaluation q103's in-sample transition matrix cannot give
    * (a model scored on its own training window always looks better
    * than it will live).
    *
    * Semantics, all deterministic and oracle-replayable:
    *   - split FIRST on epoch day (day < minDay + trainDays is train),
    *     THEN sessionize each side — the boundary cuts sessions, which
    *     is exactly what a daily retrain sees;
    *   - predictor: per from-type argmax of within-session transition
    *     counts, ties to the alphabetically-least to-type;
    *   - readout per eval from-type: the prediction, its training
    *     support, eval hits/total, acc_pm = 10⁴·hits DIV total. Eval
    *     types unseen in training keep a NULL prediction and 0 hits.
    *
    * Scale shape: two user-partitioned session windows (the same single
    * exchange [[transitions]] uses — Catalyst reuses one shuffle for
    * both sides' windows), aggregates at event-type² granularity, and
    * an event-type-sized broadcast join of predictor onto eval pairs.
    * The min-day scalar is a 1-row aggregate collected driver-side.
    */
  def transitionBacktest(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      trainDays: Long,
      gapMs: Long = 30L * 60000L
  ): DataFrame = {
    val withDay = events.withColumn("_day",
      expr(s"unix_millis(CAST(`$tsCol` AS TIMESTAMP)) DIV 86400000"))
    val d0 = withDay.agg(min(col("_day"))).head().getLong(0)
    val split = d0 + trainDays

    def sessionPairs(df: DataFrame): DataFrame = {
      val bySession = Window.partitionBy("user_id", "session_id")
        .orderBy(col("ms").asc, col("eid").asc)
      sessionized(df, userCol, tsCol, typeCol, idCol, gapMs)
        .withColumn("to_type", lead(col("etype"), 1).over(bySession))
        .filter(col("to_type").isNotNull)
        .select(col("etype").as("from_type"), col("to_type"))
    }

    val trainPairs = sessionPairs(withDay.filter(col("_day") < split))
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val wPred = Window.partitionBy("from_type")
      .orderBy(col("n").desc, col("to_type").asc)
    val pred = trainPairs
      .withColumn("rn", row_number().over(wPred))
      .filter(col("rn") === 1)
      .select(col("from_type"), col("to_type").as("pred_type"),
        col("n").as("n_train"))

    sessionPairs(withDay.filter(col("_day") >= split))
      .join(broadcast(pred), Seq("from_type"), "left")
      .groupBy("from_type")
      .agg(first(col("pred_type")).as("pred_type"),
        first(col("n_train")).as("n_train"),
        sum(when(col("to_type") === col("pred_type"), 1L).otherwise(0L))
          .as("hits"),
        count(lit(1)).as("total"))
      .withColumn("acc_pm", expr("(10000 * hits) DIV total"))
      .select("from_type", "pred_type", "n_train", "hits", "total", "acc_pm")
      .orderBy("from_type")
  }
}

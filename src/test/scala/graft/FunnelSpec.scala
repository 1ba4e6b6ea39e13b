package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("user_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")

  private val W = 100L // ms funnel window

  test("windowFunnel levels: complete, window-expired, orderless, no-anchor") {
    val df = eventsDf(Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L), // level 3
      (2L, "view", 0L), (2L, "click", 10L), (2L, "purchase", 200L), // purchase outside W
      (3L, "click", 5L),                                           // no view: level 0
      (4L, "view", 0L), (4L, "purchase", 5L), (4L, "click", 10L),  // purchase precedes click
      (5L, "click", 10L), (5L, "view", 50L)))                      // click before first view
    val got = Funnel.windowFunnel(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), W)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("level")).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 2, 5L -> 1))
  }

  test("windowFunnel reports the earliest in-window step times") {
    val df = eventsDf(Seq(
      (1L, "view", 30L), (1L, "view", 0L),       // anchor = earliest view
      (1L, "click", 40L), (1L, "click", 60L),    // first in-window click
      (1L, "purchase", 50L), (1L, "purchase", 90L))) // first purchase >= click(40)
    val r = Funnel.windowFunnel(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), W).head()
    assert((r.getAs[Long]("step1_ms"), r.getAs[Long]("step2_ms"),
      r.getAs[Long]("step3_ms")) == ((0L, 40L, 50L)))
  }

  test("windowFunnel anchor is greedy: only the FIRST step-1 event opens the window") {
    // the second view at 1000 would complete within ITS window, but the
    // documented contract anchors at ms=0, whose window misses the click
    val df = eventsDf(Seq(
      (1L, "view", 0L), (1L, "view", 1000L), (1L, "click", 1010L)))
    val r = Funnel.windowFunnel(df, "user_id", "event_type", "ts",
        Seq("view", "click"), W).head()
    assert(r.getAs[Int]("level") == 1)
  }

  test("step boundary: equal timestamps and exact window edge count") {
    val df = eventsDf(Seq(
      (1L, "view", 0L), (1L, "click", 0L),        // same ms: >= admits it
      (2L, "view", 0L), (2L, "click", 100L)))     // exactly at window edge
    val got = Funnel.windowFunnel(df, "user_id", "event_type", "ts",
        Seq("view", "click"), W)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("level")).toMap
    assert(got == Map(1L -> 2, 2L -> 2))
  }

  test("retentionCohorts builds the offset matrix from first-activity periods") {
    val df = eventsDf(Seq(
      (1L, "view", 100L), (1L, "view", 1500L), (1L, "view", 3200L), // periods 0,1,3
      (2L, "view", 1100L), (2L, "view", 2900L)))                    // periods 1,2
    val got = Funnel.retentionCohorts(df, "user_id", "ts", periodMs = 1000L)
      .collect()
      .map(r => (r.getAs[Long]("cohort_period"), r.getAs[Long]("period_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("LTV curve: staggered cohorts, zero-revenue ages kept, birth-size dilution") {
    import graft.operators.Funnel
    // period = 100ms. cohort 0: users 1,2 (u2 never buys -> dilutes);
    // cohort 1: user 3. Purchases: u1 buys 10.00 at age 0 and 2.00 at
    // age 2 (age 1 is flat and must still chart); u3 buys 5.00 at age 0.
    val rows = Seq(
      (1L, 10L, "signup", 0.0), (2L, 20L, "signup", 0.0),
      (1L, 30L, "purchase", 10.0), (3L, 150L, "signup", 0.0),
      (1L, 250L, "purchase", 2.0), (3L, 160L, "purchase", 5.0))
    val df = rows.toDF("user_id", "ms", "etype", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = Funnel.ltvCurve(df, "user_id", "ts", "etype", "value",
        valueEvent = "purchase", periodMs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // cohort 0 (period 0), ages 0..2 from the observed-age grid {0, 2}
    assert(out((0L, 0L)) == ((2L, 1000L, 1000L, 500L)))   // 10.00 over 2 users
    assert(out((0L, 2L)) == ((2L, 200L, 1200L, 600L)))    // +2.00 cumulative
    // cohort 1 (period 1): 5.00 at age 0, flat at age 2 but still charted
    assert(out((1L, 0L)) == ((1L, 500L, 500L, 500L)))
    assert(out((1L, 2L)) == ((1L, 0L, 500L, 500L)))
  }

  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.toDF("u", "et", "sec").withColumn("ts", timestamp_seconds(col("sec")))

  test("windowFunnelExact rescues the later anchor the greedy funnel misses") {
    // user 1: s1@0 cannot reach s2@1000s inside a 100s window, but the
    // second anchor s1@950 can - exact reports 2, greedy reports 1
    val rows = Seq((1L, "s1", 0L), (1L, "s1", 950L), (1L, "s2", 1000L))
    val greedy = Funnel.windowFunnel(ev(rows), "u", "et", "ts",
      Seq("s1", "s2"), windowMs = 100000L).collect().head.getAs[Int]("level")
    val exact = Funnel.windowFunnelExact(ev(rows), "u", "et", "ts",
      Seq("s1", "s2"), windowMs = 100000L).collect().head.getAs[Long]("level")
    assert(greedy == 1 && exact == 2L)
  }

  test("windowFunnelExact: level is never below the greedy funnel's") {
    val rows = Seq(
      (1L, "s1", 0L), (1L, "s2", 10L), (1L, "s3", 20L),   // clean 3
      (2L, "s1", 0L), (2L, "s3", 5L),                     // skips s2: 1
      (3L, "s2", 0L), (3L, "s3", 10L),                    // no anchor: 0
      (4L, "s1", 0L), (4L, "s1", 500L), (4L, "s2", 505L), (4L, "s3", 550L))
    val steps = Seq("s1", "s2", "s3")
    val greedy = Funnel.windowFunnel(ev(rows), "u", "et", "ts", steps, 60000L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("level").toLong).toMap
    val exact = Funnel.windowFunnelExact(ev(rows), "u", "et", "ts", steps, 60000L)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("level")).toMap
    assert(exact.keySet == greedy.keySet)
    exact.foreach { case (u, l) => assert(l >= greedy(u), s"user $u") }
    assert(exact(1L) == 3L && exact(2L) == 1L && exact(3L) == 0L && exact(4L) == 3L)
  }

  test("conversionLatency: exact counting quantiles over whole-second waits") {
    val rows = Seq(
      (1L, "signup", 0L), (1L, "purchase", 10L),    // 10s
      (2L, "signup", 0L), (2L, "purchase", 30L),    // 30s
      (3L, "signup", 0L),                           // never converts
      (4L, "signup", 10L), (4L, "purchase", 12L),   // 2s
      (5L, "purchase", 5L))                         // no signup: excluded
    val out = Funnel.conversionLatency(ev(rows), "u", "et", "ts",
      Seq(("signup", "purchase"))).collect().head
    assert(out.getAs[Long]("n_converted") == 3L)
    assert(out.getAs[Long]("p25_s") == 2L)   // rank ceil(3/4) = 1
    assert(out.getAs[Long]("p50_s") == 10L)  // rank 2
    assert(out.getAs[Long]("p75_s") == 30L)  // rank 3
    assert(out.getAs[Long]("p90_s") == 30L)
  }

  test("conversionLatency: only the first 'from' anchors, earlier 'to' ignored") {
    // purchase@5 precedes signup@10: not a conversion; purchase@25 is
    val rows = Seq((1L, "purchase", 5L), (1L, "signup", 10L), (1L, "purchase", 25L))
    val out = Funnel.conversionLatency(ev(rows), "u", "et", "ts",
      Seq(("signup", "purchase"))).collect().head
    assert(out.getAs[Long]("n_converted") == 1L)
    assert(out.getAs[Long]("p50_s") == 15L)
  }

  test("dropOffTable: survival counts and both conversion ratios") {
    // 10 users: 4 never anchor, 3 stop at s1, 2 at s2, 1 completes
    val rows =
      (1L to 4L).map(u => (u, "x", 0L)) ++
      (5L to 7L).map(u => (u, "s1", 0L)) ++
      (8L to 9L).flatMap(u => Seq((u, "s1", 0L), (u, "s2", 10L))) ++
      Seq((10L, "s1", 0L), (10L, "s2", 10L), (10L, "s3", 20L))
    val out = Funnel.dropOffTable(ev(rows), "u", "et", "ts",
        Seq("s1", "s2", "s3"), windowMs = 3600000L)
      .collect().map(r => r.getAs[Long]("step") ->
        ((r.getAs[Long]("n_reached"), r.getAs[Long]("conv_prev_pm"),
          r.getAs[Long]("conv_total_pm")))).toMap
    assert(out(1L) == ((6L, 600L, 600L)))
    assert(out(2L) == ((3L, 500L, 300L)))
    assert(out(3L) == ((1L, 333L, 100L)))
  }

  test("conversionLatency: an unconverting pair reports a 0-count row") {
    val rows = Seq((1L, "signup", 0L))
    val out = Funnel.conversionLatency(ev(rows), "u", "et", "ts",
      Seq(("signup", "purchase"))).collect().head
    assert(out.getAs[Long]("n_converted") == 0L)
    assert(out.isNullAt(out.fieldIndex("p50_s")))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CountMin

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toksDf(rows: Seq[Seq[String]]) = rows.toDF("toks")

  private val corpus = toksDf(Seq(
    Seq("a", "a", "a", "b", "b", "c"),
    Seq("a", "b", "d", "d"),
    Seq("a", "c", "e")))
  // stream of 13: a=5, b=3, d=2, c=2, e=1

  test("sketch is bounded by depth*width and counts the whole stream in every row") {
    val sk = CountMin.buildSketch(corpus, "toks", depth = 3, width = 8).collect()
    assert(sk.length <= 3 * 8)
    // each of the 3 rows partitions the 13 occurrences
    val perRow = sk.groupBy(_.getAs[Int]("j")).view.mapValues(_.map(_.getAs[Long]("c")).sum)
    assert(perRow.toMap == Map(0 -> 13L, 1 -> 13L, 2 -> 13L))
  }

  test("estimates never undershoot the true count (one-sided guarantee)") {
    val truth = Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 2L, "e" -> 1L)
    // tiny width forces collisions; the bound must hold regardless
    for (width <- Seq(2, 8, 1024)) {
      val sk = CountMin.buildSketch(corpus, "toks", depth = 4, width = width)
      val est = CountMin.estimate(truth.keys.toSeq.toDF("token"), sk, "token",
          depth = 4, width = width)
        .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("est")).toMap
      truth.foreach { case (t, c) => assert(est(t) >= c, s"width=$width token=$t") }
    }
  }

  test("wide sketch with few tokens is exact; unseen tokens estimate 0") {
    val sk = CountMin.buildSketch(corpus, "toks", depth = 4, width = 1024)
    val est = CountMin.estimate(Seq("a", "b", "c", "d", "e", "zzz").toDF("token"),
        sk, "token", depth = 4, width = 1024)
      .collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("est")).toMap
    assert(est == Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 2L, "e" -> 1L, "zzz" -> 0L))
  }

  test("heavy hitters: every true heavy hitter reported, audit column exact") {
    // threshold 3/13: true HH are a (5) and b (3)
    val got = CountMin.heavyHitters(corpus, "toks", num = 3, den = 13,
        depth = 4, width = 1024)
      .collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("est_count"), r.getAs[Long]("exact_count"))))
      .toMap
    assert(got.keySet.intersect(Set("a", "b")) == Set("a", "b")) // no false negatives
    assert(got("a") == ((5L, 5L)) && got("b") == ((3L, 3L)))     // exact at this width
    // any extra row is a collision false positive: est cleared the bar
    got.values.foreach { case (est, _) => assert(est * 13 >= 13L * 3) }
  }

  test("selfJoinSize: both F2 estimators exact without collisions; bounds with them") {
    // keys: a×3, b×2, c×1 → F2 = 9+4+1 = 14, n_rows 6, n_keys 3
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val wide = CountMin.selfJoinSize(df, "k", depth = 4, width = 1024).head()
    assert((wide.getAs[Long]("n_rows"), wide.getAs[Long]("n_keys"),
      wide.getAs[Long]("f2_upper"), wide.getAs[Long]("f2_exact")) == ((6L, 3L, 14L, 14L)))
    // no collisions → signed counters are ±f(key): AMS is exact too
    assert(wide.getAs[Long]("f2_ams") == 14L)
    for (width <- Seq(1, 2, 4)) {
      val r = CountMin.selfJoinSize(df, "k", depth = 3, width = width).head()
      assert(r.getAs[Long]("f2_upper") >= 14L, s"width=$width") // never undershoots
      assert(r.getAs[Long]("f2_upper") <= 36L)                  // Σc² ≤ (Σc)² = n²
      assert(r.getAs[Long]("f2_ams") >= 0L)                     // unbiased, either side
      assert(r.getAs[Long]("f2_ams") <= 36L)
    }
  }

  test("sketches merge by summing counters on (j, bucket)") {
    val half1 = toksDf(Seq(Seq("a", "a", "a", "b", "b", "c")))
    val half2 = toksDf(Seq(Seq("a", "b", "d", "d"), Seq("a", "c", "e")))
    val merged = CountMin.buildSketch(half1, "toks", 3, 16)
      .unionByName(CountMin.buildSketch(half2, "toks", 3, 16))
      .groupBy("j", "bucket").agg(org.apache.spark.sql.functions.sum("c").as("c"))
    val whole = CountMin.buildSketch(corpus, "toks", 3, 16)
    val a = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("joinSize: exact inner product, CM never undershoots, AMS exact when wide") {
    import spark.implicits._
    val a = Seq(Some(1L), Some(1L), Some(2L), Some(3L), None).toDF("k")
    val b = Seq(Some(1L), Some(2L), Some(2L), Some(4L), None).toDF("k")
    // true join size = fA(1)*fB(1) + fA(2)*fB(2) = 2*1 + 1*2 = 4
    val r = CountMin.joinSize(a, "k", b, "k", depth = 4, width = 1024).collect()(0)
    val (upper, ams, exact) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(exact == 4L)
    assert(upper >= exact) // the CM bound's contract
    // 1024 buckets for 4 keys: no collisions, both estimators are exact
    assert(upper == 4L && ams == 4L)
  }

  test("joinSize: disjoint key sets estimate zero (densified depth rows)") {
    import spark.implicits._
    val a = Seq(1L, 2L, 3L).toDF("k")
    val b = Seq(7L, 8L, 9L).toDF("k")
    val r = CountMin.joinSize(a, "k", b, "k", depth = 4, width = 1024).collect()(0)
    // with 1024 buckets the sides share no buckets: every per-j row is
    // absent from the overlap join and must still enter min/median as 0
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("trailing hitters: window merge of daily CM states, threshold, candidate scoping") {
    import spark.implicits._
    // day1: u1 x5, u2 x1; day2: u1 x3, u3 x2; day3: u3 x1 — window 2, phi 1/2
    val rows = Seq.fill(5)((1L, "u1")) ++ Seq((1L, "u2")) ++
      Seq.fill(3)((2L, "u1")) ++ Seq.fill(2)((2L, "u3")) ++ Seq((3L, "u3"))
    val got = CountMin.trailingHeavyHitters(rows.toDF("day", "v"), "v", "day",
        num = 1L, den = 2L, depth = 4, width = 1024, windowDays = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // day1 total 6 -> u1(5); day2 total 11 -> u1(8); day3 total 6 ->
    // u1(3) and u3(3) both exactly at threshold (est*2 >= 6); u2 is not
    // even a candidate at day3 (outside its window)
    assert(got == Seq(
      (1L, "u1", 5L, 5L),
      (2L, "u1", 8L, 8L),
      (3L, "u1", 3L, 3L),
      (3L, "u3", 3L, 3L)))
  }

  test("stored-state serve: linear merge of split-day states equals the all-at-once build") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq.fill(5)((1L, "u1")) ++ Seq((1L, "u2")) ++
      Seq.fill(3)((2L, "u1")) ++ Seq.fill(2)((2L, "u3")) ++ Seq((3L, "u3"))
    // deterministic row index baked into the data (a nondeterministic
    // id expression evaluated in two filters could split differently
    // per execution): split EVERY day's rows across two batches — CM
    // states are linear, so merged partial-day states must equal the
    // one-shot states
    val indexed = rows.zipWithIndex.map { case ((d, v), i) => (d, v, i.toLong) }
      .toDF("d", "v", "i")
    val all = indexed.select("d", "v")
    val (b1, b2) = (indexed.filter($"i" % 2 === 0).select("d", "v"),
      indexed.filter($"i" % 2 =!= 0).select("d", "v"))
    val merged = CountMin.mergeDailyStates(
      CountMin.dailyStates(b1, "v", "d", 4, 1024),
      CountMin.dailyStates(b2, "v", "d", 4, 1024))
    val oneShot = CountMin.dailyStates(all, "v", "d", 4, 1024)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(m(merged) == m(oneShot))
    // serving from the state tables reproduces the full operator's
    // sketch columns (candidates/totals derived at the day grain)
    val dayCounts = all.groupBy("d", "v").agg(count(lit(1)).as("cnt"))
    val totals = dayCounts.groupBy("d").agg(sum("cnt").as("n"))
    val cands = dayCounts.join(totals, Seq("d"))
      .filter(col("cnt") * 2 * 2 >= col("n")).select("d", "v")
    val served = CountMin.trailingHittersFromStates(merged, cands, totals,
        num = 1L, den = 2L, depth = 4, width = 1024, windowDays = 2)
      .orderBy(col("day"), col("est_count").desc, col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(served == Seq(
      (1L, "u1", 5L), (2L, "u1", 8L), (3L, "u1", 3L), (3L, "u3", 3L)))
  }
}

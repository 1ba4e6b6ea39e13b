package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.Profile

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("histogram: binning, edge clamp, null exclusion, empty bins absent") {
    val df = Seq(("g", Some(-5.0)), ("g", Some(0.0)), ("g", Some(9.99)),
      ("g", Some(10.0)), ("g", Some(25.0)), ("g", Some(999.0)),
      ("g", None), ("h", Some(15.0)))
      .toDF("grp", "v")
    val got = Profile.equiWidthHistogram(df, Seq("grp"), "v", 0.0, 30.0, 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // g: -5 clamps into bin 0; {0, 9.99} bin 0; 10 bin 1; 25 bin 2;
    // 999 clamps into bin 2; null excluded. h: 15 -> bin 1. Bin (g,1)
    // has exactly one member (10.0); empty (h,0)/(h,2) absent.
    assert(got == Map(
      ("g", 0L) -> ((0.0, 10.0, 3L)),
      ("g", 1L) -> ((10.0, 20.0, 1L)),
      ("g", 2L) -> ((20.0, 30.0, 2L)),
      ("h", 1L) -> ((10.0, 20.0, 1L))))
  }

  test("histogram guards: bins >= 1, lo < hi") {
    val df = Seq(("g", 1.0)).toDF("grp", "v")
    intercept[IllegalArgumentException](
      Profile.equiWidthHistogram(df, Seq("grp"), "v", 0.0, 10.0, 0))
    intercept[IllegalArgumentException](
      Profile.equiWidthHistogram(df, Seq("grp"), "v", 10.0, 10.0, 5))
  }

  test("summary: counts, nulls, exact distincts, raw min/max per column") {
    val df = Seq(
      ("a", Some(1.0), Some(10L)), ("a", Some(1.0), Some(20L)),
      ("a", Some(3.0), None), ("b", None, Some(5L)))
      .toDF("grp", "x", "y")
    val got = Profile.summary(df, Seq("grp"), Seq("x", "y"))
      .filter($"grp" === "a").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got(("a", "x")) == ((3L, 0L, 2L, 1.0, 3.0)))
    assert(got(("a", "y")) == ((3L, 1L, 2L, 10.0, 20.0)))
    // all-null group: n_distinct 0; min/max are null -> read as 0.0 is
    // wrong, so assert via isNullAt instead
    val bx = Profile.summary(df, Seq("grp"), Seq("x"))
      .filter($"grp" === "b").collect()(0)
    assert(bx.getLong(2) == 1L && bx.getLong(3) == 1L && bx.getLong(4) == 0L)
    assert(bx.isNullAt(5) && bx.isNullAt(6))
  }

  test("functional dependencies: holds, violated, null-as-value grouping") {
    val df = Seq(
      (1L, Some("a"), 10L), (1L, Some("a"), 11L),   // k=1 -> s pinned to a
      (2L, Some("b"), 12L), (2L, Some("c"), 13L),   // k=2 -> two s values
      (3L, None, 14L), (3L, None, 15L))             // k=3 -> null, pinned
      .toDF("k", "s", "v")
    val got = Profile.functionalDependencies(df,
        Seq((Seq("k"), "s"), (Seq("k", "s"), "v")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // k -> s: 3 groups, only k=2 violates (null counts as ONE value)
    assert(got(("k", "s")) == ((3L, 1L, false)))
    // (k,s) -> v: groups (1,a) and (3,null) hold 2 distinct v each and
    // violate; (2,b) and (2,c) each pin a single v and hold
    assert(got(("k,s", "v")) == ((4L, 2L, false)))
    // a genuinely held FD
    val held = Profile.functionalDependencies(
      Seq((1L, "x"), (2L, "y")).toDF("k", "s"), Seq((Seq("k"), "s")))
      .collect()(0)
    assert(held.getLong(3) == 0L && held.getBoolean(4))
    intercept[IllegalArgumentException](
      Profile.functionalDependencies(df, Nil))
    intercept[IllegalArgumentException](
      Profile.functionalDependencies(df, Seq((Seq("k", "s"), "s"))))
  }

  test("summary guard: at least one column") {
    intercept[IllegalArgumentException](
      Profile.summary(Seq(("a", 1.0)).toDF("g", "v"), Seq("g"), Nil))
  }

  test("effect strength: a fully explained metric scores 10000") {
    import graft.operators.Profile
    val df = Seq(("a", 5L), ("a", 5L), ("b", 9L), ("b", 9L))
      .toDF("g", "y")
    val Array(r) = Profile.effectStrength(df, col("y"), Seq("g")).collect()
    assert(r.getLong(1) == 2L && r.getLong(2) == 10000L)
  }

  test("effect strength: hand-computed partial eta-squared") {
    import graft.operators.Profile
    // A: {0, 2}, B: {10, 12} -> SSB/SST = 100/104 -> 9615 pm
    val df = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 12L)).toDF("g", "y")
    val Array(r) = Profile.effectStrength(df, col("y"), Seq("g")).collect()
    assert(r.getLong(2) == 9615L)
  }

  test("effect strength: identical group distributions score 0; constants guard") {
    import graft.operators.Profile
    val flat = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L)).toDF("g", "y")
    assert(Profile.effectStrength(flat, col("y"), Seq("g"))
      .collect()(0).getLong(2) == 0L)
    val const = Seq(("a", 7L), ("b", 7L)).toDF("g", "y")
    assert(Profile.effectStrength(const, col("y"), Seq("g"))
      .collect()(0).getLong(2) == 0L)
  }

  test("effect strength ranks features by explanatory power") {
    import graft.operators.Profile
    // g1 fully determines y; g2 is noise
    val df = (1L to 40L).map(i =>
      (if (i % 2 == 0) "even" else "odd", (i % 5).toString, (i % 2) * 10L))
      .toDF("g1", "g2", "y")
    val out = Profile.effectStrength(df, col("y"), Seq("g1", "g2"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("g1") == 10000L)
    assert(out("g2") < 2000L)
  }

  test("Benford: exact-Benford counts score chi2 = 0 and pass") {
    import graft.operators.Profile
    // O_d exactly N*p_d: value d has leading digit d
    val rows = Profile.BenfordPm.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n.toInt)((i + 1).toLong) }
    val out = Profile.benfordAudit(rows.toDF("v"), col("v")).collect()
    assert(out.length == 9)
    out.foreach { r =>
      assert(r.getAs[Long]("chi2_term") == 0L)
      assert(!r.getAs[Boolean]("benford_rejected"))
    }
  }

  test("Benford: a uniform feed is rejected; every digit row is present") {
    import graft.operators.Profile
    val out = Profile.benfordAudit((1L to 9999L).toDF("v"), col("v")).collect()
    assert(out.length == 9)
    assert(out.forall(_.getAs[Boolean]("benford_rejected")))
  }

  test("Benford: single-digit feeds keep all 9 rows with full missing-mass terms") {
    import graft.operators.Profile
    val out = Profile.benfordAudit(Seq.fill(500)(123L).toDF("v"), col("v"))
      .collect().map(r => r.getAs[Long]("digit") ->
        ((r.getAs[Long]("observed"), r.getAs[Long]("chi2_term")))).toMap
    assert(out.keySet == (1L to 9L).toSet)
    assert(out(1L)._1 == 500L)
    // a digit nobody produced still contributes (N·p)²/(N·p) = N·p
    assert(out(2L) == ((0L, 500L * 1761L)))
  }

  test("Benford: zero and negative values are excluded from n_used") {
    import graft.operators.Profile
    val rows = Seq(-5L, 0L, 100L, 200L, 300L)
    val out = Profile.benfordAudit(rows.toDF("v"), col("v")).collect()
    assert(out.head.getAs[Long]("n_used") == 3L)
  }

  test("dispersion index: hand-computed ratios and the burst flag") {
    import graft.operators.Profile
    val even = Seq(("a", 1L), ("a", 1L), ("a", 3L), ("a", 3L))
    val burst = Seq(("b", 0L), ("b", 0L), ("b", 0L), ("b", 10L))
    val out = Profile.dispersionIndex((even ++ burst).toDF("g", "y"), "g", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("a") == ((6666L, false)))   // var 4/3 over mean 2
    assert(out("b") == ((100000L, true)))  // one burst unit: D = 10
  }

  test("dispersion index: constant and degenerate groups report 0") {
    import graft.operators.Profile
    val rows = Seq(("c", 5L), ("c", 5L), ("d", 7L), ("z", 0L), ("z", 0L))
    val out = Profile.dispersionIndex(rows.toDF("g", "y"), "g", "y")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == Map("c" -> 0L, "d" -> 0L, "z" -> 0L))
  }

  test("Gini: even mass scores 0, one-holder mass scores (n-1)/n") {
    import graft.operators.Profile
    val rows = Seq(("e", 5L), ("e", 5L), ("e", 5L), ("e", 5L),
      ("x", 0L), ("x", 0L), ("x", 0L), ("x", 10L))
    val out = Profile.giniIndex(rows.toDF("g", "y"), "g", "y")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("e") == 0L)
    assert(out("x") == 7500L)
  }

  test("Gini: hand-computed mixed distribution with ties") {
    import graft.operators.Profile
    // values 1,1,2,4 -> sorted ranks: T = 1*1+1*2+2*3+4*4 = 25
    // G = (2*25 - 5*8)/(4*8) = 10/32 -> 3125 pm
    val rows = Seq(("m", 1L), ("m", 1L), ("m", 2L), ("m", 4L))
    val Array(r) = Profile.giniIndex(rows.toDF("g", "y"), "g", "y").collect()
    assert(r.getLong(3) == 3125L)
  }

  test("tail ratios: a perfect alpha=1 power law reads flat 500pm") {
    import graft.operators.Profile
    // survivors at 1,2,4,8 = 8,4,2,1: every doubling halves
    val vals = Seq(1L, 1L, 1L, 1L, 2L, 2L, 4L, 8L)
    val out = Profile.tailRatios(vals.toDF("v"), "v", k0 = 1L, doublings = 3)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("survivors"), Option(r.get(r.fieldIndex("ratio_pm")))))).toMap
    assert(out(1L) == ((8L, None)))
    assert(out(2L) == ((4L, Some(500L))))
    assert(out(4L) == ((2L, Some(500L))))
    assert(out(8L) == ((1L, Some(500L))))
  }

  test("hill tail index: hand-computed micro-nat estimate with boundary ties") {
    import graft.operators.Profile
    // top-7 = {16, 8, 8, 4, 4, 4, 4} (all four boundary 4s taken),
    // H = (L16 + 2*L8 - 3*L4) DIV 7 with L = floor(ln*1e6 + .5)
    val vals = Seq(16L, 8L, 8L, 4L, 4L, 4L, 4L) ++ Seq.fill(100)(1L)
    val out = Profile.hillTailIndex(vals.toDF("v"), "v", k = 7).collect().head
    assert(out.getAs[Long]("n_units") == 107L)
    assert(out.getAs[Long]("k") == 7L && out.getAs[Long]("x_k") == 4L)
    val h = (2772589L + 2L * 2079442L - 3L * 1386294L) / 7L
    assert(out.getAs[Long]("h_micronats") == h)
    assert(out.getAs[Long]("alpha_ppm") == 1000000000000L / h)
  }

  test("hill tail index: k=2 reduces to ln of the top ratio over 2") {
    import graft.operators.Profile
    val out = Profile.hillTailIndex(
      Seq(16L, 8L, 1L, 1L).toDF("v"), "v", k = 2).collect().head
    assert(out.getAs[Long]("x_k") == 8L)
    assert(out.getAs[Long]("h_micronats") == 693147L / 2L) // (L16-L8) DIV 2
  }

  test("hill tail index: k beyond the data clamps to the unit count") {
    import graft.operators.Profile
    val out = Profile.hillTailIndex(
      Seq(4L, 2L, 0L, -3L).toDF("v"), "v", k = 10).collect().head
    assert(out.getAs[Long]("n_units") == 2L) // values < 1 ignored
    assert(out.getAs[Long]("k") == 2L)
  }

  test("tail ratios: a short tail collapses and empty levels report NULL") {
    import graft.operators.Profile
    val vals = Seq(1L, 1L, 1L, 2L) // nothing reaches 4
    val out = Profile.tailRatios(vals.toDF("v"), "v", 1L, 3)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("survivors"), Option(r.get(r.fieldIndex("ratio_pm")))))).toMap
    assert(out(2L) == ((1L, Some(250L))))
    assert(out(4L) == ((0L, Some(0L))))
    assert(out(8L)._1 == 0L && out(8L)._2.isEmpty) // prev survivors = 0
  }
}

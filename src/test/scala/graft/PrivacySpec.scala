package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // classes: (Z1,M) x3, (Z1,F) x1, (Z2,M) x2, (null,F) x2
  private val rows = Seq(
    (Some("Z1"), "M"), (Some("Z1"), "M"), (Some("Z1"), "M"),
    (Some("Z1"), "F"),
    (Some("Z2"), "M"), (Some("Z2"), "M"),
    (None, "F"), (None, "F")).toDF("zip", "sex")

  test("report: risky classes/rows under k=3; null QI groups like a value") {
    val r = Privacy.kAnonymityReport(rows, Seq("zip", "sex"), k = 3L).collect()(0)
    // risky (< 3): (Z1,F)=1, (Z2,M)=2, (null,F)=2 -> 3 classes, 5 rows
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getBoolean(5)) == ((8L, 4L, 3L, 5L, 1L, false)))
  }

  test("report: k small enough that every class passes") {
    val r = Privacy.kAnonymityReport(rows, Seq("sex"), k = 2L).collect()(0)
    // classes M=5, F=3 — both >= 2
    assert((r.getLong(2), r.getLong(3), r.getBoolean(5)) == ((0L, 0L, true)))
  }

  test("riskyClasses: smallest class first, sizes attached") {
    val got = Privacy.riskyClasses(rows, Seq("zip", "sex"), k = 3L).collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (Some("Z1"), "F", 1L),
      (None, "F", 2L),
      (Some("Z2"), "M", 2L)))
  }

  test("empty table: zero everything, vacuously anonymous") {
    val empty = Seq.empty[(String, String)].toDF("zip", "sex")
    val r = Privacy.kAnonymityReport(empty, Seq("zip"), k = 5L).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(4), r.getBoolean(5)) ==
      ((0L, 0L, 0L, true)))
  }

  test("forgetKeys: purged frames, self-checking ledger, null keys ignored") {
    val users = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("uid", "name")
    val logs = Seq((1L, 10L), (1L, 11L), (3L, 12L), (9L, 13L))
      .toDF("uid", "eid")
    val deletions = Seq(Some(1L), Some(1L), None, Some(42L)).toDF("k")
    val (purged, ledger) = Privacy.forgetKeys(
      Seq(("users", users, "uid"), ("logs", logs, "uid")), deletions, "k")
    val led = ledger.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(led == Map(
      "users" -> ((3L, 1L, 2L)),
      "logs" -> ((4L, 2L, 2L))))
    led.values.foreach { case (before, p, after) => assert(before == p + after) }
    val purgedUsers = purged.toMap.apply("users").collect().map(_.getLong(0)).toSet
    assert(purgedUsers == Set(2L, 3L))
    val purgedLogs = purged.toMap.apply("logs").collect().map(_.getLong(0)).toSet
    assert(purgedLogs == Set(3L, 9L)) // unknown key 42 purges nothing
    intercept[IllegalArgumentException](Privacy.forgetKeys(Nil, deletions, "k"))
    intercept[IllegalArgumentException](Privacy.forgetKeys(
      Seq(("t", users, "uid"), ("t", logs, "uid")), deletions, "k"))
  }

  test("guards: empty QI list, k < 2") {
    intercept[IllegalArgumentException](
      Privacy.kAnonymityReport(rows, Nil, 5L))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityReport(rows, Seq("zip"), 1L))
    intercept[IllegalArgumentException](Privacy.riskyClasses(rows, Nil, 5L))
  }

  test("l-diversity: a big-but-homogeneous class fails; null sensitive counts as a value") {
    // (Z1): 4 members but all sensitive 'flu' -> homogeneous under l=2
    // (Z2): 3 members, {flu, cold} -> diverse
    // (Z3): 2 members, {flu, null} -> null counts as a value -> diverse
    val t = Seq(
      ("Z1", Some("flu")), ("Z1", Some("flu")), ("Z1", Some("flu")), ("Z1", Some("flu")),
      ("Z2", Some("flu")), ("Z2", Some("cold")), ("Z2", Some("flu")),
      ("Z3", Some("flu")), ("Z3", None)).toDF("zip", "dx")
    val r = Privacy.lDiversityReport(t, Seq("zip"), "dx", l = 2L).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getBoolean(5)) == ((9L, 3L, 1L, 4L, 1L, false)))
    // k-anonymity alone would have passed Z1 (size 4 >= 2) — the exact
    // gap l-diversity exists to close
    val k = Privacy.kAnonymityReport(t, Seq("zip"), k = 2L).collect()(0)
    assert(k.getBoolean(5))
    intercept[IllegalArgumentException](
      Privacy.lDiversityReport(t, Seq("zip"), "dx", 1L))
  }

  test("t-closeness: a class mirroring the global distribution scores 0; a one-band class scores its EMD") {
    import graft.operators.Privacy
    // global bands {0: 2, 1: 2}; class a holds only band 0, class b only 1
    val df = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L)).toDF("qi", "band")
    val out = Privacy.tClosenessReport(df, Seq("qi"), "band", tPm = 2000L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("emd_pm"), r.getAs[Boolean]("within_t")))).toMap
    // EMD = |1 - 0.5| / (m-1) = 0.5 -> 5000 pm, violating t = 0.2
    assert(out("a") == ((5000L, false)) && out("b") == ((5000L, false)))
    // a balanced class IS the global distribution
    val bal = Seq(("c", 0L), ("c", 1L), ("d", 0L), ("d", 1L)).toDF("qi", "band")
    Privacy.tClosenessReport(bal, Seq("qi"), "band", tPm = 2000L)
      .collect().foreach(r => assert(r.getAs[Long]("emd_pm") == 0L
        && r.getAs[Boolean]("within_t")))
  }

  test("t-closeness: null bands form the first-ordered category") {
    import graft.operators.Privacy
    val df = Seq(("a", Some(0L)), ("a", None), ("b", Some(0L)), ("b", None))
      .toDF("qi", "band")
    // both classes mirror the global {null: 2, 0: 2} split exactly
    Privacy.tClosenessReport(df, Seq("qi"), "band", tPm = 100L)
      .collect().foreach(r => assert(r.getAs[Long]("emd_pm") == 0L))
  }

  test("t-closeness: mass farther along the ordinal scale costs more EMD") {
    import graft.operators.Privacy
    // global mass concentrated at rank 0; class lo sits one rank away,
    // class hi three ranks away (bands 0 < 1 < 5 in rank space)
    val df = (1 to 20).map(i => (s"pad$i", 0L)) ++
      Seq(("lo", 1L), ("lo", 1L), ("hi", 5L), ("hi", 5L))
    val out = Privacy.tClosenessReport(df.toDF("qi", "band"), Seq("qi"),
        "band", tPm = 2000L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("emd_pm")).toMap
    assert(out("lo") == 4583L)  // hand replay: d = 44, 10^4*44/(2*2*24)
    assert(out("hi") == 8750L)  // d = 84: the extra rank costs transport
    assert(out("lo") < out("hi"))
  }

}

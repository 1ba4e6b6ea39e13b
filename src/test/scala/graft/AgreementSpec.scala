package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Agreement

class AgreementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kappaOf(rows: Seq[(String, String)]) = {
    val r = Agreement.cohenKappa(
      rows.map { case (a, b) => ("g", a, b) }.toDF("key", "a", "b"),
      "key", "a", "b").collect().head
    (r.getAs[Long]("n"), r.getAs[Long]("n_agree"), r.getAs[Long]("po_pm"),
      r.getAs[Long]("pe_pm"),
      if (r.isNullAt(r.fieldIndex("kappa_pm"))) None
      else Some(r.getAs[Long]("kappa_pm")))
  }

  test("kappa textbook frame: po 0.70, pe 0.52, kappa 0.375") {
    val rows =
      Seq.fill(45)(("y", "y")) ++ Seq.fill(25)(("n", "n")) ++
        Seq.fill(15)(("y", "n")) ++ Seq.fill(15)(("n", "y"))
    assert(kappaOf(rows) == ((100L, 70L, 7000L, 5200L, Some(3750L))))
  }

  test("kappa: perfect agreement is 10000, perfect symmetric disagreement is -10000") {
    assert(kappaOf(Seq(("x", "x"), ("y", "y")))._5 == Some(10000L))
    assert(kappaOf(Seq(("x", "y"), ("y", "x")))._5 == Some(-10000L))
  }

  test("kappa: both raters constant -> chance agreement is certain -> NULL") {
    val (n, agree, po, pe, k) = kappaOf(Seq.fill(3)(("x", "x")))
    assert(n == 3L && agree == 3L && po == 10000L && pe == 10000L)
    assert(k.isEmpty)
  }

  test("kappa: skewed margins make raw agreement flattering, kappa is not") {
    // both raters say 'en' 9 of 10 times but NEVER on the same items
    // beyond the forced overlap: agreement 8/10 yet kappa near zero
    val rows = Seq.fill(8)(("en", "en")) ++ Seq(("en", "de"), ("de", "en"))
    val (_, _, po, pe, k) = kappaOf(rows)
    assert(po == 8000L && pe == 8200L)
    assert(k == Some(-1111L)) // (10*8 - 82) / (100 - 82) = -2/18
  }

  test("kappa matches brute-force confusion-matrix arithmetic on random labelings") {
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { trial =>
      val labels = Vector("en", "de", "fr", "zh")
      val rows = Seq.fill(80)((labels(rnd.nextInt(4)), labels(rnd.nextInt(4))))
      val (n, agree, po, pe, k) = kappaOf(rows)
      val byA = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val byB = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nAgree = rows.count { case (a, b) => a == b }.toLong
      val src = labels.map(l =>
        byA.getOrElse(l, 0L) * byB.getOrElse(l, 0L)).sum
      assert(n == 80L && agree == nAgree, s"trial $trial")
      assert(po == 10000L * nAgree / 80L, s"trial $trial")
      assert(pe == 10000L * src / (80L * 80L), s"trial $trial")
      val num = 80L * nAgree - src
      val den = 80L * 80L - src
      val want = (if (num >= 0) 1L else -1L) * (10000L * math.abs(num) / den)
      assert(k == Some(want), s"trial $trial")
    }
  }

  test("kappa: keys compute independently and missing-margin labels contribute zero") {
    val df = Seq(
      ("k1", "x", "x"), ("k1", "x", "y"),
      ("k2", "a", "a"), ("k2", "b", "b"), ("k2", "c", "z"))
      .toDF("key", "a", "b")
    val got = Agreement.cohenKappa(df, "key", "a", "b").collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_agree"))).toMap
    assert(got("k1") == ((2L, 1L)) && got("k2") == ((3L, 2L)))
    // k2: labels c (rater a) and z (rater b) appear on one margin only
    // -> r*c dot product counts only a and b: src = 1 + 1 = 2;
    // kappa = (3*2 - 2)/(9 - 2) = 4/7 -> 5714 pm
    val k2 = Agreement.cohenKappa(df.filter($"key" === "k2"),
      "key", "a", "b").collect().head
    assert(k2.getAs[Long]("kappa_pm") == 5714L)
  }
}

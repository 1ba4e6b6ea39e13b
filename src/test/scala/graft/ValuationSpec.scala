package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Valuation

class ValuationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("leave-one-out: helping and hurting groups get opposite signs") {
    // g1 = {10, 20} drags the mean down; g2 = {40} pulls it up
    val out = Valuation.leaveOneOut(
      Seq(("g1", 10L), ("g1", 20L), ("g2", 40L)).toDF("g", "v"), "g", "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("g1").getAs[Long]("mean_micro") == 15000000L)
    assert(out("g1").getAs[Long]("loo_mean_micro") == 40000000L)
    assert(out("g1").getAs[Long]("contribution_micro") == 23333333L - 40000000L)
    assert(out("g2").getAs[Long]("loo_mean_micro") == 15000000L)
    assert(out("g2").getAs[Long]("contribution_micro") == 23333333L - 15000000L)
    assert(out("g1").getAs[Long]("global_mean_micro") == 23333333L)
    assert(out("g1").getAs[Long]("share_pm") == 666L)
  }

  test("leave-one-out: a group covering the whole input has no complement") {
    val out = Valuation.leaveOneOut(
      Seq(("only", 5L), ("only", 7L)).toDF("g", "v"), "g", "v").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("loo_mean_micro")))
    assert(out.head.isNullAt(out.head.fieldIndex("contribution_micro")))
    assert(out.head.getAs[Long]("mean_micro") == 6000000L)
  }

  test("growth accounting: hand-computed lever split telescopes exactly") {
    // w1: U=2 O=4 R=400; w2: U=3 O=9 R=1800
    // d_users = 200, d_freq = 900-600 = 300, d_value = 900 -> delta 1400
    val df = Seq((1L, 2L, 4L, 400L), (2L, 3L, 9L, 1800L))
      .toDF("p", "u", "o", "r")
    val out = Valuation.growthAccounting(df, "p", "u", "o", "r").collect()
    assert(out.length == 1)
    val x = out.head
    assert(x.getAs[Long]("d_users") == 200L)
    assert(x.getAs[Long]("d_freq") == 300L)
    assert(x.getAs[Long]("d_value") == 900L)
    assert(x.getAs[Long]("residual") == 0L)
  }

  test("growth accounting: residual stays within truncation dust") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 12L).map { p =>
      val u = rnd.nextInt(50) + 3L
      val o = u + rnd.nextInt(100)
      (p, u, o, o * (rnd.nextInt(900) + 100L))
    }
    Valuation.growthAccounting(rows.toDF("p", "u", "o", "r"),
      "p", "u", "o", "r").collect().foreach { x =>
      assert(math.abs(x.getAs[Long]("residual")) <= 3L)
      assert(x.getAs[Long]("delta") ==
        x.getAs[Long]("d_users") + x.getAs[Long]("d_freq") +
        x.getAs[Long]("d_value") + x.getAs[Long]("residual"))
    }
  }

  test("grouped jackknife: constant metric gives exactly zero SE") {
    import graft.operators.Valuation
    val rows = (1L to 200L).map(u => (u, 9L))
    val out = Valuation.groupedJackknife(rows.toDF("u", "v"), "u", "v",
      g = 20, salt = "jk").collect().head
    assert(out.getAs[Long]("mean_micro") == 9000000L)
    assert(out.getAs[Long]("se2_micro2") == 0L)
    assert(out.getAs[Long]("se_micro") == 0L)
  }

  test("grouped jackknife: matches a hand replay over the same md5 buckets") {
    import graft.operators.{Sampling, Valuation}
    val rows = (1L to 300L).map(u => (u, u % 37))
    val df = rows.toDF("u", "v")
    val out = Valuation.groupedJackknife(df, "u", "v", g = 10, salt = "jk2")
      .collect().head
    // replay: collect the SAME buckets, compute loo means + SE in Scala
    val b = Sampling.withSplitId(df, "u", Seq.fill(10)(0.1), "jk2", "bkt")
      .collect().map(r => (r.getAs[Int]("bkt"),
        r.getAs[Long]("v"))).groupBy(_._1)
    val (nn, ss) = (300L, rows.map(_._2).sum)
    val ms = b.values.map { rs =>
      val (n, s) = (rs.size.toLong, rs.map(_._2).sum)
      (1000000L * (ss - s)) / (nn - n)
    }.toSeq
    val g = ms.size.toLong
    val (sm, sm2) = (ms.sum, ms.map(m => BigInt(m) * m).sum)
    val se2 = ((g - 1) * (g * sm2 - BigInt(sm) * sm) / (g * g)).toLong
    assert(out.getAs[Long]("g") == g)
    assert(out.getAs[Long]("se2_micro2") == se2)
    assert(out.getAs[Long]("se_micro") == math.sqrt(se2.toDouble).floor.toLong)
  }

  test("grouped jackknife SE agrees with the bootstrap CI width on the same data") {
    import graft.operators.{Bootstrap, Valuation}
    val rows = (1L to 500L).map(u => (u, 10L + (u * u) % 41))
    val df = rows.toDF("u", "v")
    val jk = Valuation.groupedJackknife(df, "u", "v", g = 20, salt = "x")
      .collect().head.getAs[Long]("se_micro")
    val ci = Bootstrap.meanCi(df, "u", "v", reps = 64, loPm = 25, hiPm = 975,
      salt = "x").collect().head
    val half = (ci.getAs[Long]("ci_hi_micro") - ci.getAs[Long]("ci_lo_micro")) / 2
    // 95% CI half-width ~ 1.96*se: the two methods must agree within 2x
    assert(half > jk && half < 4L * jk, s"half=$half se=$jk")
  }

  test("leave-one-out: contributions are consistent (sum of n*contrib telescopes)") {
    // exact identity modulo per-group truncation: each contribution is
    // within 1 micro of (n_g/(N-n_g))*(mean_g - global_mean)
    val df = Seq(("a", 1L), ("a", 3L), ("b", 10L), ("c", 2L), ("c", 4L), ("c", 6L))
      .toDF("g", "v")
    val out = Valuation.leaveOneOut(df, "g", "v").collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n"); val nn = 6L
      val exact = (r.getAs[Long]("mean_micro") - r.getAs[Long]("global_mean_micro")).toDouble *
        n / (nn - n)
      assert(math.abs(r.getAs[Long]("contribution_micro") - exact) <= 2.0)
    }
  }
}

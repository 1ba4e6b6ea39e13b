package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Inference

class InferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------- chiSquareAudit

  test("chi2 of an exactly independent table is 0 (every cell term 0)") {
    // o = [[10,20],[30,60]]: e_ij = o_ij exactly
    val rows =
      Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(60)(("y", "q"))
    val out = Inference.chiSquareAudit(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("term_ppb") == 0L))
    assert(out.head.getAs[Long]("chi2_ppb") == 0L)
    assert(out.head.getAs[Long]("dof") == 1L)
    assert(out.head.getAs[Long]("v2_ppm") == 0L)
  }

  test("chi2 of a perfectly associated 2x2 reaches V^2 = 1") {
    // diag [[5,0],[0,5]]: chi2 = N = 10, each cell term = 2.5e9 ppb
    val rows = Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q"))
    val out = Inference.chiSquareAudit(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.length == 4) // zero cells materialized by the grid
    assert(out.forall(_.getAs[Long]("term_ppb") == 2500000000L))
    assert(out.head.getAs[Long]("chi2_ppb") == 10000000000L)
    assert(out.head.getAs[Long]("v2_ppm") == 1000000L)
  }

  test("chi2 zero-fills absent cells (dropping them understates chi2)") {
    // (y,q) never occurs: its expected count still contributes
    val rows = Seq.fill(2)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
      Seq.fill(2)(("y", "p"))
    val out = Inference.chiSquareAudit(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.length == 4)
    val absent = out.find(r => r.getAs[String]("a") == "y" &&
      r.getAs[String]("b") == "q").get
    assert(absent.getAs[Long]("o") == 0L)
    // N=6, r=2, c=2: term = 10^9*(0-4)^2 DIV (6*2*2) = 666666666
    assert(absent.getAs[Long]("term_ppb") == 666666666L)
  }

  // ----------------------------------------------------------- cohenKappa

  test("kappa is 1 for perfect agreement") {
    val rows = Seq((0, 0), (0, 0), (1, 1), (1, 1), (2, 2))
    val out = Inference.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.head.getAs[Long]("po_ppm") == 1000000L)
    assert(out.head.getAs[Long]("kappa_ppm") == 1000000L)
  }

  test("kappa is 0 at exactly chance-level agreement") {
    // confusion [[1,1],[1,1]]: po = pe = 1/2
    val rows = Seq((0, 0), (0, 1), (1, 0), (1, 1))
    val out = Inference.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.head.getAs[Long]("po_ppm") == 500000L)
    assert(out.head.getAs[Long]("pe_ppm") == 500000L)
    assert(out.head.getAs[Long]("kappa_ppm") == 0L)
  }

  test("kappa is negative for below-chance (systematic disagreement)") {
    // [[0,2],[2,0]]: D=0, E=8, kappa = -8/8 = -1
    val rows = Seq((0, 1), (0, 1), (1, 0), (1, 0))
    val out = Inference.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.head.getAs[Long]("kappa_ppm") == -1000000L)
  }

  test("kappa cell grid carries the observed confusion counts") {
    val rows = Seq((0, 0), (0, 1), (0, 1), (1, 1))
    val out = Inference.cohenKappa(rows.toDF("a", "b"), "a", "b").collect()
    val cells = out.map(r => (r.getAs[Int]("a"), r.getAs[Int]("b")) ->
      r.getAs[Long]("o")).toMap
    assert(cells == Map((0, 0) -> 1L, (0, 1) -> 2L, (1, 1) -> 1L))
  }

  // ---------------------------------------------- mutualInformation

  test("MI of perfect dependence equals the marginal entropy (u = 1)") {
    // diag [[2,0],[0,2]]: every pmi = ln 2 = 693147 micronats = H(A)
    val rows = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
    val out = Inference.mutualInformation(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.length == 2) // only observed cells materialize
    assert(out.forall(_.getAs[Long]("pmi_micronats") == 693147L))
    assert(out.head.getAs[Long]("mi_micronats") == 693147L)
    assert(out.head.getAs[Long]("h_a_micronats") == 693147L)
    assert(out.head.getAs[Long]("u_a_ppm") == 1000000L)
    assert(out.head.getAs[Long]("u_b_ppm") == 1000000L)
  }

  test("MI of exact independence is 0") {
    val rows = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
    val out = Inference.mutualInformation(rows.toDF("a", "b"), "a", "b").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("pmi_micronats") == 0L))
    assert(out.head.getAs[Long]("mi_micronats") == 0L)
    assert(out.head.getAs[Long]("u_a_ppm") == 0L)
  }

  test("MI is asymmetric in the uncertainty coefficients when marginals differ") {
    // A has 3 values, B has 2 -> H(A) > H(B) -> u_a < u_b for shared MI
    val rows = Seq(("x", "p"), ("y", "p"), ("z", "q"), ("z", "q"))
    val out = Inference.mutualInformation(rows.toDF("a", "b"), "a", "b").collect()
    val r = out.head
    assert(r.getAs[Long]("h_a_micronats") > r.getAs[Long]("h_b_micronats"))
    assert(r.getAs[Long]("u_a_ppm") < r.getAs[Long]("u_b_ppm"))
    assert(r.getAs[Long]("mi_micronats") > 0L)
  }

  // ---------------------------------------------------------- mannWhitney

  test("mannWhitney: fully separated groups give U=0 and r=-1") {
    val rows = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1), (6L, 1))
    val out = Inference.mannWhitney(rows.toDF("v", "g"), "v", "g").collect()
    val r = out.head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("u2_a") == 0L)
    assert(r.getAs[Long]("r_ppm") == -1000000L)
    // z^2 = 4.5^2/5.25 = 3.857 > 3.8416: barely but exactly significant
    assert(r.getAs[Boolean]("significant"))
  }

  test("mannWhitney midranks: ties split rank mass exactly") {
    // A={1,2}, B={2,3}: R_A = 1 + 2.5 -> 2R_A = 7, U2 = 7 - 2*3 = 1
    val rows = Seq((1L, 0), (2L, 0), (2L, 1), (3L, 1))
    val out = Inference.mannWhitney(rows.toDF("v", "g"), "v", "g").collect()
    val r = out.head
    assert(r.getAs[Long]("u2_a") == 1L)
    assert(r.getAs[Long]("tie_term") == 6L) // one pair tied: 2^3-2
  }

  test("mannWhitney: identical groups sit exactly at the null center") {
    val rows = Seq((5L, 0), (5L, 0), (5L, 1), (5L, 1))
    val out = Inference.mannWhitney(rows.toDF("v", "g"), "v", "g").collect()
    val r = out.head
    assert(r.getAs[Long]("u2_a") == 4L) // = n_a*n_b: U = nanb/2
    assert(r.getAs[Long]("r_ppm") == 0L)
    assert(!r.getAs[Boolean]("significant"))
  }
}

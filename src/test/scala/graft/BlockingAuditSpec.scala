package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BlockingAudit

class BlockingAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def audit(rows: Seq[(String, String)]) = {
    val r = BlockingAudit.audit(rows.toDF("truth", "blk"), "truth", "blk")
      .collect().head
    (r.getAs[Long]("n_rows"),
      r.getAs[Long]("total_pairs"),
      r.getAs[Long]("cand_pairs"),
      r.getAs[Long]("true_pairs"),
      r.getAs[Long]("coblocked_pairs"),
      r.getAs[Long]("reduction_pm"),
      if (r.isNullAt(r.fieldIndex("completeness_pm"))) -1L
      else r.getAs[Long]("completeness_pm"))
  }

  test("hand frame: one split truth pair halves completeness") {
    // truth groups: g1 = {1,2,3} (3 pairs), g2 = {4,5} (1 pair); blocks
    // co-locate (1,2) and (4,5) but strand 3 -> completeness 4/4... no:
    // g1 pairs (1,2),(1,3),(2,3): only (1,2) co-blocked; g2's (4,5)
    // co-blocked -> 2 of 4 true pairs = 5000 pm.
    val (n, tot, cand, tp, cb, red, comp) = audit(Seq(
      ("g1", "A"), ("g1", "A"), ("g1", "B"),
      ("g2", "C"), ("g2", "C"), ("x1", "B"), ("x2", "C")))
    assert(n == 7L && tot == 21L)
    // blocks: A=2, B=2, C=3 -> 1 + 1 + 3 = 5 candidate pairs
    assert(cand == 5L && tp == 4L && cb == 2L)
    assert(red == 10000L - 5L * 10000L / 21L) // 7620
    assert(comp == 5000L)
  }

  test("single-block scheme: zero reduction, full completeness") {
    val (_, tot, cand, tp, cb, red, comp) =
      audit(Seq(("g", "Z"), ("g", "Z"), ("h", "Z")))
    assert(tot == 3L && cand == 3L && tp == 1L && cb == 1L)
    assert(red == 0L && comp == 10000L)
  }

  test("no true pairs: completeness is NULL, reduction still reported") {
    val (_, _, _, tp, _, red, comp) =
      audit(Seq(("a", "A"), ("b", "B"), ("c", "A")))
    assert(tp == 0L && comp == -1L) // NULL sentinel from the helper
    assert(red == 10000L - 1L * 10000L / 3L)
  }

  test("perfect blocking: truth key as block key maximizes both") {
    val rows = (1 to 30).map(i => (s"g${i % 5}", s"g${i % 5}"))
    val (_, tot, cand, tp, cb, _, comp) = audit(rows)
    assert(cand == tp && cb == tp && comp == 10000L)
    assert(tot == 30L * 29L / 2L && tp == 5L * (6L * 5L / 2L))
  }
}

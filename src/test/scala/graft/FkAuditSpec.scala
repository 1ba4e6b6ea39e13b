package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FkAudit

class FkAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counts children, null fks, orphans, and coverage per edge") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk_col")
    val parent = Seq(1L, 2L, 2L, 3L).toDF("pk_col") // dup parents collapse
    val out = FkAudit.audit(Seq(("e1", child, "fk_col", parent, "pk_col")))
      .collect().head
    assert(out.getString(0) == "e1")
    assert(out.getAs[Long]("n_child") == 5L)
    assert(out.getAs[Long]("n_null_fk") == 1L)
    assert(out.getAs[Long]("n_orphan") == 1L)     // the 9
    assert(out.getAs[Long]("coverage_pm") == 6000L) // 3 of 5
  }

  test("multiple edges union in order and a clean edge reads 10000pm") {
    val c1 = Seq(1L, 2L).toDF("fk")
    val p1 = Seq(1L, 2L, 3L).toDF("pk")
    val c2 = Seq(7L).toDF("fk")
    val p2 = Seq(8L).toDF("pk")
    val out = FkAudit.audit(Seq(
        ("clean", c1, "fk", p1, "pk"), ("dirty", c2, "fk", p2, "pk")))
      .orderBy("edge").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("coverage_pm")).toMap
    assert(out == Map("clean" -> 10000L, "dirty" -> 0L))
  }

  test("an empty edge list fails loudly (require), not with a reduce crash") {
    intercept[IllegalArgumentException] {
      graft.operators.FkAudit.audit(Seq.empty)
    }
  }

  test("empty child table yields NULL coverage, not a crash") {
    val child = Seq.empty[Long].toDF("fk")
    val parent = Seq(1L).toDF("pk")
    val r = FkAudit.audit(Seq(("empty", child, "fk", parent, "pk")))
      .collect().head
    assert(r.getAs[Long]("n_child") == 0L)
    assert(r.isNullAt(r.fieldIndex("coverage_pm")))
  }
}

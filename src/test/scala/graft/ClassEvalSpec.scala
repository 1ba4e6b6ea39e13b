package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClassEval

class ClassEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("confusion: hand-computed P/R/F1 on a 3-class table") {
    // truth a: 2 predicted a, 1 predicted b; truth b: 1 predicted b
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("t", "p")
    val out = ClassEval.confusionReport(df, "t", "p").collect()
      .map(r => r.getAs[String]("clazz") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_true") == 3L && a.getAs[Long]("n_pred") == 2L)
    assert(a.getAs[Long]("precision_pm") == 10000L)
    assert(a.getAs[Long]("recall_pm") == 6666L)
    // F1 nests the truncated P and R: 2*10000*6666 / 16666 = 7999
    assert(a.getAs[Long]("f1_pm") == 7999L)
    val b = out("b")
    assert(b.getAs[Long]("precision_pm") == 5000L)
    assert(b.getAs[Long]("recall_pm") == 10000L)
    assert(a.getAs[Long]("accuracy_pm") == 7500L) // 3 of 4
  }

  test("confusion: classes absent from one side carry zero support, null metrics") {
    // 'c' is only ever predicted, never true; 'd' only true, never predicted
    val df = Seq(("a", "a"), ("a", "c"), ("d", "a")).toDF("t", "p")
    val out = ClassEval.confusionReport(df, "t", "p").collect()
      .map(r => r.getAs[String]("clazz") -> r).toMap
    assert(out.keySet == Set("a", "c", "d"))
    val c = out("c")
    assert(c.getAs[Long]("n_true") == 0L && c.getAs[Long]("n_pred") == 1L)
    assert(c.isNullAt(c.fieldIndex("recall_pm")))
    assert(c.getAs[Long]("precision_pm") == 0L)
    val d = out("d")
    assert(d.isNullAt(d.fieldIndex("precision_pm")))
    assert(d.getAs[Long]("recall_pm") == 0L)
    assert(d.isNullAt(d.fieldIndex("f1_pm"))) // no P to harmonize with
  }

  test("threshold sweep: hand-computed operating points, recall monotone") {
    val df = Seq((10L, 1L), (5L, 0L), (1L, 1L)).toDF("score", "pos")
    val out = ClassEval.thresholdSweep(df, "score", "pos").collect()
    assert(out.map(_.getAs[Long]("score")).toList == List(10L, 5L, 1L))
    val top = out(0); val mid = out(1); val low = out(2)
    assert(top.getAs[Long]("precision_pm") == 10000L)
    assert(top.getAs[Long]("recall_pm") == 5000L)
    assert(top.getAs[Long]("f1_pm") == 6666L)
    assert(mid.getAs[Long]("precision_pm") == 5000L)
    assert(mid.getAs[Long]("f1_pm") == 5000L)
    assert(low.getAs[Long]("precision_pm") == 6666L)
    assert(low.getAs[Long]("recall_pm") == 10000L)
    assert(low.getAs[Long]("f1_pm") == 7999L)
    val recalls = out.map(_.getAs[Long]("recall_pm"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
  }

  test("confusion: a perfect classifier scores 10000 everywhere") {
    val df = Seq(("x", "x"), ("y", "y"), ("y", "y")).toDF("t", "p")
    val out = ClassEval.confusionReport(df, "t", "p").collect()
    assert(out.forall(_.getAs[Long]("f1_pm") == 10000L))
    assert(out.forall(_.getAs[Long]("accuracy_pm") == 10000L))
  }

  test("prAuc: perfect separation scores 1e6; hand trapezoid on an interleaved case") {
    val perfect = Seq((9L, 1), (8L, 1), (7L, 0)).toDF("s", "y")
    val p1 = ClassEval.prAuc(perfect, "s", "y").collect().head
    assert(p1.getAs[Long]("pr_auc_micro") == 1000000L)
    assert(p1.getAs[Long]("total_pos") == 2L && p1.getAs[Long]("n") == 3L)
    // (9,1),(8,0),(7,1),(6,0): terms 500000 + 0 + 7e6 DIV 24 + 0 = 791666
    val mixed = Seq((9L, 1), (8L, 0), (7L, 1), (6L, 0)).toDF("s", "y")
    val p2 = ClassEval.prAuc(mixed, "s", "y").collect().head
    assert(p2.getAs[Long]("pr_auc_micro") == 791666L)
    assert(p2.getAs[Long]("n_cells") == 4L)
  }

  test("prAuc: no positives yields zero area; ties collapse to one cell") {
    val none = Seq((5L, 0), (4L, 0)).toDF("s", "y")
    assert(ClassEval.prAuc(none, "s", "y").collect().head
      .getAs[Long]("pr_auc_micro") == 0L)
    // all rows one score cell: single point, kept0 = 0 branch only:
    // (1e6 * 2 * (2 + 4)) DIV (2 * 2 * 4) = 750000
    val tied = Seq((5L, 1), (5L, 1), (5L, 0), (5L, 0)).toDF("s", "y")
    val t = ClassEval.prAuc(tied, "s", "y").collect().head
    assert(t.getAs[Long]("n_cells") == 1L)
    assert(t.getAs[Long]("pr_auc_micro") == 750000L)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PartitionPlan

class PartitionPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(keys: Seq[Long], n: Int, res: Long, maxCells: Int = 65536) =
    PartitionPlan.rangePlan(keys.toDF("k"), "k", n, res, maxCells)
      .orderBy("range_id").collect()
      .map(r => (r.getAs[Long]("range_id"), r.getAs[Long]("lo_key"),
        r.getAs[Long]("hi_key"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("balance_pm")))

  test("uniform keys cut into equal ranges at perfect balance") {
    val out = plan(0L until 12L, n = 4, res = 1L)
    assert(out.length == 4)
    assert(out.map(_._4).toSeq == Seq(3L, 3L, 3L, 3L))
    assert(out.forall(_._5 == 10000L))
    // half-open, contiguous, increasing
    assert(out.sliding(2).forall { case Array(a, b) => a._3 == b._2 })
  }

  test("a cell heavier than total/n absorbs boundaries: fewer, fatter ranges") {
    // cell 5 carries 100 of 106 rows - boundaries 1..3 all land on it
    val keys = (0L until 6L) ++ Seq.fill(100)(5L)
    val out = plan(keys, n = 4, res = 1L)
    assert(out.length < 4)
    assert(out.map(_._4).sum == 106L)
    val fat = out.maxBy(_._4)
    assert(fat._4 >= 100L && fat._5 > 10000L)
  }

  test("quantization groups keys into resolution-wide cells") {
    val out = plan(Seq(0L, 9L, 10L, 19L, 20L, 29L), n = 3, res = 10L)
    assert(out.length == 3)
    assert(out.map(x => (x._2, x._3)).toSeq ==
      Seq((0L, 10L), (10L, 20L), (20L, 30L)))
  }

  test("negative keys and oversized grids fail loudly") {
    intercept[Exception] { plan(Seq(-1L, 2L), n = 2, res = 1L) }
    intercept[Exception] { plan(0L until 20L, n = 2, res = 1L, maxCells = 10) }
  }

  test("randomized: census accounts for every row, ranges are disjoint and balanced") {
    val rnd = new scala.util.Random(11)
    val keys = Seq.fill(2000)(rnd.nextInt(500).toLong)
    val out = plan(keys, n = 8, res = 7L)
    assert(out.map(_._4).sum == 2000L)
    assert(out.forall(r => r._2 < r._3))
    assert(out.sliding(2).forall { case Array(a, b) => a._3 <= b._2 })
    // no range should be grossly unbalanced on uniform data at this grid
    assert(out.forall(_._5 <= 14000L))
  }

  test("saltPlan: ceil arithmetic and the max_task_rows self-check") {
    val rows = Seq.fill(33)("hot") ++ Seq.fill(16)("warm") ++
      Seq.fill(3)("cold") ++ Seq(null.asInstanceOf[String])
    val out = PartitionPlan.saltPlan(rows.toDF("k"), "k", 16L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_salts"),
          r.getAs[Long]("max_task_rows"))).toMap
    assert(out("hot") == ((33L, 3L, 11L)))
    assert(out("warm") == ((16L, 1L, 16L)))
    assert(out("cold") == ((3L, 1L, 3L)))
    assert(!out.contains(null))
    assert(out.values.forall(_._3 <= 16L))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MixShift

class MixShiftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(seg: String, inB: Boolean, n: Int, v: Long) =
    Seq.fill(n)((seg, inB, v))

  test("Simpson's case: every rate rises, the total falls, effects telescope exactly") {
    // A: X (n2, v2, rate 1), Y (n8, v32, rate 4) -> M_A = 3.4
    // B: X (n8, v16, rate 2), Y (n2, v10, rate 5) -> M_B = 2.6
    // both rates UP, total DOWN: the mix slid to the cheap segment.
    val df = (rows("X", false, 2, 1L) ++ rows("Y", false, 8, 4L) ++
      rows("X", true, 8, 2L) ++ rows("Y", true, 2, 5L))
      .toDF("seg", "in_b", "cents")
    val out = MixShift.decompose(df, "seg", "in_b", "cents")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("rate_a_micro"), r.getAs[Long]("rate_b_micro"),
          r.getAs[Long]("rate_effect_micro"),
          r.getAs[Long]("mix_effect_micro"))).toMap
    assert(out("X") == ((1000000L, 2000000L, 200000L, 1200000L)))
    assert(out("Y") == ((4000000L, 5000000L, 800000L, -3000000L)))
    // the exact telescoping identity: effects sum to M_B - M_A = -0.8
    val total = out.values.map(t => t._3 + t._4).sum
    assert(total == -800000L)
  }

  test("segment missing from a period reports zeros and NULL effects") {
    val df = (rows("X", false, 2, 3L) ++ rows("X", true, 2, 3L) ++
      rows("Z", true, 1, 7L)) // Z only exists in B
      .toDF("seg", "in_b", "cents")
    val z = MixShift.decompose(df, "seg", "in_b", "cents")
      .filter($"seg" === "Z").collect().head
    assert(z.getAs[Long]("n_a") == 0L && z.getAs[Long]("n_b") == 1L)
    assert(z.isNullAt(z.fieldIndex("rate_a_micro")))
    assert(z.isNullAt(z.fieldIndex("rate_effect_micro")))
    // mix effect IS defined (a new segment is pure mix)
    assert(z.getAs[Long]("mix_effect_micro") != 0L)
  }
}

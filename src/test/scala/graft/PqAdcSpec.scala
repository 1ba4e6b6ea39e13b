package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class PqAdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed codes, LUT and ADC; assignment ties pick the lower codeword") {
    val base = Seq(
      (1L, Seq(5f, 0f, 0f, 5f)),  // codes (c0, c0) -> ADC 2e6 + 2e6
      (2L, Seq(0f, 5f, 5f, 0f)),  // codes (c1, c1) -> ADC 0
      (3L, Seq(3f, 3f, 3f, 3f))   // ties both subspaces -> c0, ADC 4e6
    ).toDF("vec_id", "embedding")
    val pinned = Seq(
      IndexedSeq(1.0, 0.0, 0.0, 1.0), // codeword 0 per subspace: (1,0) / (0,1)
      IndexedSeq(0.0, 1.0, 1.0, 0.0)) // codeword 1 per subspace: (0,1) / (1,0)
    val query = Seq(2.0, 0.0, 0.0, 2.0)
    val got = Similarity.pqAdcTopK(base, "embedding", "vec_id", query, 3, pinned, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 4000000L), (3L, 4000000L), (2L, 0L)))
  }

  test("guards: m must divide dim; pinned vectors must match the query dim") {
    val base = Seq((1L, Seq(1f, 2f, 3f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      Similarity.pqAdcTopK(base, "embedding", "vec_id", Seq(1.0, 2.0, 3.0), 1,
        Seq(IndexedSeq(1.0, 2.0, 3.0)), m = 2))
    intercept[IllegalArgumentException](
      Similarity.pqAdcTopK(base, "embedding", "vec_id", Seq(1.0, 2.0, 3.0, 4.0), 1,
        Seq(IndexedSeq(1.0, 2.0)), m = 2))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbedAudit

class EmbedAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Int, Seq[Float])]) =
    rows.toDF("vec_id", "label", "embedding")

  test("a vector nearer a foreign centroid is flagged; aligned vectors are not") {
    // label 0 points along e1, label 1 along e2; vec 10 is labeled 0 but
    // sits exactly on label 1's axis — the canonical mislabel
    val got = EmbedAudit.centroidMarginAudit(df(Seq(
        (1L, 0, Seq(1f, 0f, 0f, 0f)),
        (2L, 0, Seq(1f, 0f, 0f, 0f)),
        (3L, 0, Seq(1f, 0f, 0f, 0f)),
        (4L, 1, Seq(0f, 1f, 0f, 0f)),
        (5L, 1, Seq(0f, 1f, 0f, 0f)),
        (6L, 1, Seq(0f, 1f, 0f, 0f)),
        (10L, 0, Seq(0f, 1f, 0f, 0f)))),
      "embedding", "vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4), r.getBoolean(5))).toSeq

    val flagged = got.filter(_._6).map(_._1)
    assert(flagged == Seq(10L), s"flagged $flagged")
    // vec 10: own centroid (3,1,0,0)·(0,1,0,0) -> 1/sqrt(10); other
    // centroid is pure e2 -> cosine 1.0 against label 1
    val v10 = got.find(_._1 == 10L).get
    assert(v10._4 == 1)
    assert(math.abs(v10._3 - 1.0 / math.sqrt(10.0)) < 1e-12)
    assert(math.abs(v10._5 - 1.0) < 1e-12)
    // a clean label-0 vector scores 3/sqrt(10) own, 1/sqrt(10) other
    val v1 = got.find(_._1 == 1L).get
    assert(!v1._6 && v1._3 > v1._5)
  }

  test("zero-quantized vectors are dropped; best-other ties break to the lower label") {
    val got = EmbedAudit.centroidMarginAudit(df(Seq(
        (1L, 0, Seq(1f, 0f, 0f, 0f)),
        (2L, 1, Seq(0f, 1f, 0f, 0f)),
        (3L, 2, Seq(0f, 0f, 1f, 0f)),
        // equidistant from labels 1 and 2 -> tie must pick label 1
        (4L, 0, Seq(0f, 1f, 1f, 0f)),
        // quantizes to the zero vector -> dropped
        (9L, 0, Seq(0f, 0f, 0f, 0f)))),
      "embedding", "vec_id", "label").collect()
    assert(!got.map(_.getLong(0)).contains(9L))
    val v4 = got.find(_.getLong(0) == 4L).get
    assert(v4.getInt(3) == 1) // tie between labels 1 and 2 -> lower wins
  }

  test("health report: collapse reads 10000 for identical vectors, 10000/n for orthogonal") {
    import graft.operators.EmbedAudit
    val rows =
      (1L to 5L).map(i => (i, 7, Seq(0.5f, 0.5f, 0.0f, 0.0f))) ++ // collapsed
      (1L to 4L).map(i => (10L + i, 8,
        Seq.tabulate(4)(j => if (j == (i - 1)) 1.0f else 0.0f)))  // one-hot spread
    val out = EmbedAudit.healthReport(
        rows.toDF("vec_id", "label", "embedding"), "embedding", "vec_id", "label")
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("collapse_pm")).toMap
    assert(out(7) == 10000L)
    assert(out(8) == 2500L) // 1/n with n = 4
  }

  test("health report drops null-id and empty vectors") {
    import graft.operators.EmbedAudit
    val rows = Seq(
      (Some(1L), 1, Seq(1.0f, 0.0f)), (None, 1, Seq(1.0f, 0.0f)),
      (Some(3L), 1, Seq.empty[Float]))
    val Array(r) = EmbedAudit.healthReport(
      rows.toDF("vec_id", "label", "embedding"), "embedding", "vec_id", "label")
      .collect()
    assert(r.getAs[Long]("n") == 1L)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Contracts
import graft.operators.Contracts._

class ContractsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rep(df: org.apache.spark.sql.DataFrame, cs: Seq[Contract]) =
    Contracts.report(df, cs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("each contract polices exactly its own aspect: nulls never double-fail") {
    // id=4 has a null v: not_null counts it once; in_range/in_set/matches
    // must NOT count it again.
    val df = Seq((1L, Some("aa"), Some(5.0)), (2L, Some("zz"), Some(99.0)),
      (3L, Some("ab"), Some(7.0)), (4L, None, Option.empty[Double]))
      .toDF("id", "s", "v")
    val got = rep(df, Seq(
      notNull("s"),
      inRange("v", "0.0", "10.0"),
      inSet("s", Seq("aa", "ab")),
      matches("s", "^a[a-z]$")))
    assert(got("not_null(s)") == ((1L, 4L, false)))
    assert(got("in_range(v)") == ((1L, 4L, false))) // only the 99.0 row
    assert(got("in_set(s)") == ((1L, 4L, false)))   // only "zz"
    assert(got("matches(s)") == ((1L, 4L, false)))  // only "zz"
  }

  test("unique counts excess rows; null keys group like values") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    val got = rep(df, Seq(Unique("unique(k)", Seq("k"))))
    // three 1s -> 2 excess, two nulls -> 1 excess
    assert(got("unique(k)") == ((3L, 6L, false)))
  }

  test("foreign key counts non-null orphans only") {
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = rep(child, Seq(ForeignKey("fk(fk->parent)", "fk", parent, "pk")))
    // two 9s orphaned; the null is not an FK violation (not_null's job)
    assert(got("fk(fk->parent)") == ((2L, 5L, false)))
  }

  test("all-holding contracts report pass=true with zero violations") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val got = rep(df, Seq(notNull("id"), Unique("unique(id)", Seq("id"))))
    assert(got.values.forall { case (v, t, p) => v == 0L && t == 2L && p })
  }

  test("empty input: zero totals, zero violations, everything passes") {
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val got = rep(df, Seq(notNull("s"), Unique("u", Seq("id")),
      ForeignKey("f", "id", Seq(1L).toDF("pk"), "pk")))
    assert(got.values.forall { case (v, t, p) => v == 0L && t == 0L && p })
  }

  test("guards: empty contract list, duplicate labels, empty key list") {
    val df = Seq((1L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException](Contracts.report(df, Nil))
    intercept[IllegalArgumentException](
      Contracts.report(df, Seq(notNull("s"), notNull("s"))))
    intercept[IllegalArgumentException](
      Contracts.report(df, Seq(Unique("u", Nil))))
  }
}

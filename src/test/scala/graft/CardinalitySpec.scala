package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cardinality
import graft.plans.KmvSketch

class CardinalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("kmv aggregate keeps the k smallest distinct longs, ascending") {
    val got = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L).toDF("u")
      .agg(KmvSketch.kmv(col("u"), 3).as("kmv"))
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 3L, 5L))
  }

  test("below k the sketch is the whole distinct set and the estimate is exact") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 7L)).toDF("seg", "v")
    val got = Cardinality.distinctEstimate(df, "v", "seg", k = 64)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "a" -> ((2L, 2L)), "b" -> ((1L, 1L)), "__all__" -> ((3L, 3L))))
  }

  test("at and above k the estimate lands within ~3/sqrt(k) of the truth") {
    val n = 5000
    val df = (0 until n).map(i => ("s", i.toLong)).toDF("seg", "v")
    val Array(seg, all) = Cardinality.distinctEstimate(df, "v", "seg", k = 256)
      .orderBy("segment").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      match { case a => a.sortBy(_._1).reverse } // ("s", ...), ("__all__", ...)
    assert(seg._3 == n && all._3 == n)
    // k=256 → σ ≈ n/16; allow 3σ
    assert(math.abs(seg._2 - n) < 3 * n / 16, s"estimate ${seg._2} too far from $n")
    assert(seg._2 == all._2) // single segment: merged sketch is the same sketch
  }

  test("sketch merge across partitions equals the sketch of the union") {
    val whole = (0 until 1000).map(_.toLong).toDF("v").select(Cardinality.kmvHash(col("v")).as("u"))
      .agg(KmvSketch.kmv(col("u"), 32)).head().getSeq[Long](0)
    // force many partitions so partial merge paths run
    val sharded = (0 until 1000).map(_.toLong).toDF("v").repartition(17)
      .select(Cardinality.kmvHash(col("v")).as("u"))
      .agg(KmvSketch.kmv(col("u"), 32)).head().getSeq[Long](0)
    assert(whole == sharded)
  }

  test("pairwiseOverlap: small segments give exact set algebra, closure holds") {
    // below k the sketches ARE the sets, so every estimate is exact
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L),
      ("c", 9L)).toDF("seg", "v")
    val got = Cardinality.pairwiseOverlap(df, "v", "seg", k = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      ("a", "b") -> ((3L, 3L, 4L, 2L)),  // |A∪B|=4, |A∩B|=2
      ("a", "c") -> ((3L, 1L, 4L, 0L)),
      ("b", "c") -> ((3L, 1L, 4L, 0L))))
  }

  test("pairwiseOverlap union sketch equals the sketch of the unioned stream") {
    val segA = (0 until 500).map(i => ("a", i.toLong))
    val segB = (250 until 750).map(i => ("b", i.toLong))
    val pair = Cardinality.pairwiseOverlap((segA ++ segB).toDF("seg", "v"), "v", "seg", k = 32)
      .head()
    val mergedDirect = Cardinality.kmvSketches(
        (segA ++ segB).map { case (_, v) => ("all", v) }.toDF("seg", "v"), "v", "seg", 32)
      .head().getSeq[Long](1)
    val estDirect = Seq(Tuple1(mergedDirect)).toDF("kmv")
      .select(Cardinality.kmvEstimate(col("kmv"), 32)).head().getLong(0)
    assert(pair.getAs[Long]("est_union") == estDirect)
  }

  test("nulls contribute nothing") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("a", java.lang.Long.valueOf(1L)),
        org.apache.spark.sql.Row("a", null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("seg", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))))
    val got = Cardinality.distinctEstimate(df, "v", "seg", k = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "__all__" -> 1L))
  }

  test("trailing rollup: window merge of daily sketches; gaps shrink n_days; audit matches") {
    val df = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "b"), (2L, "c"),
      (3L, "d"),
      (10L, "a")).toDF("day", "v")
    // k large -> sketches hold whole sets, estimates are exact
    val got = Cardinality.trailingDistinct(df, "v", "day", k = 64, windowDays = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 2L),   // {a,b}
      (2L, 2L, 3L, 3L),   // {a,b,c}
      (3L, 2L, 3L, 3L),   // {b,c,d}
      (10L, 1L, 1L, 1L))) // gap: window sees only day 10
    // small k exercises the estimator branch on the merged sketch
    val est = Cardinality.trailingDistinct(df, "v", "day", k = 2, windowDays = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(est.keySet == Set(1L, 2L, 3L, 10L))
    assert(est(10L) == 1L) // below k stays exact
    intercept[IllegalArgumentException](
      Cardinality.trailingDistinct(df, "v", "day", k = 2, windowDays = 0))
  }

  test("stored-state lineage: batch commits merge into one snapshot; serving from the store matches the all-at-once build") {
    import graft.sink.SnapshotSink
    val root = java.nio.file.Files.createTempDirectory("kmv_states").toString
    val all = Seq(
      (1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"), (3L, "d"), (4L, "a"))
      .toDF("day", "v")
    val b1 = all.filter(col("day") <= 2) // first batch: days 1-2
    val b2 = all.filter(col("day") >= 2) // second batch OVERLAPS day 2
    def states(df: org.apache.spark.sql.DataFrame) =
      Cardinality.kmvSketches(df, "v", "day", k = 64).withColumnRenamed("segment", "day")
    SnapshotSink.commit(states(b1), root)
    SnapshotSink.commit(
      Cardinality.mergeKmvStates(SnapshotSink.read(spark, root), states(b2), 64), root)
    // same lineage: two committed versions, one logical table
    assert(SnapshotSink.versions(spark, root) == Seq(1, 2))
    // merged states ≡ the states an all-at-once build produces (closure),
    // including the overlapping day 2 whose two partial sketches combined
    val stored = SnapshotSink.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val oneShot = states(all)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(stored == oneShot)
    // serving the rollup from the STORE matches serving from fresh states
    val served = Cardinality.trailingDistinctFromStates(
        SnapshotSink.read(spark, root), k = 64, windowDays = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val fresh = Cardinality.trailingDistinctFromStates(states(all), k = 64, windowDays = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(served == fresh)
    assert(served.map(t => (t._1, t._3)) ==
      Seq((1L, 2L), (2L, 3L), (3L, 3L), (4L, 2L))) // {a,b} {a,b,c} {b,c,d} {d,a}
  }
}

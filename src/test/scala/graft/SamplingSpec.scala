package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("splits are disjoint, exhaustive, and roughly proportional") {
    val parts = Sampling.hashSplit(ids, "id", Seq(0.8, 0.1, 0.1), salt = "v1")
    val counts = parts.map(_.count())
    assert(counts.sum == 2000L)
    assert(counts(0) > 1450 && counts(0) < 1750, s"train ${counts(0)}")
    assert(counts(1) > 100 && counts(1) < 320, s"val ${counts(1)}")
    // disjoint: no id in two splits
    assert(parts(0).join(parts(1), "id").isEmpty)
    assert(parts(1).join(parts(2), "id").isEmpty)
  }

  test("assignment is content-stable: repartitioning changes nothing") {
    val a = Sampling.withSplitId(ids, "id", Seq(0.5, 0.5), salt = "s")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sampling.withSplitId(ids.repartition(7), "id", Seq(0.5, 0.5), salt = "s")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("salt re-rolls the split; same salt pins it") {
    val s1 = Sampling.withSplitId(ids, "id", Seq(0.5, 0.5), "a")
      .filter($"split_id" === 0).select("id").collect().map(_.getLong(0)).toSet
    val s1again = Sampling.withSplitId(ids, "id", Seq(0.5, 0.5), "a")
      .filter($"split_id" === 0).select("id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.withSplitId(ids, "id", Seq(0.5, 0.5), "b")
      .filter($"split_id" === 0).select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s1again)
    assert(s1 != s2)
  }

  test("null split keys fail loudly instead of leaking into the last split") {
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("id")
    val ex = intercept[Exception] {
      Sampling.withSplitId(withNull, "id", Seq(0.5, 0.5)).collect()
    }
    assert(ex.getMessage.contains("non-null") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("bad fractions are rejected") {
    intercept[IllegalArgumentException](Sampling.hashSplit(ids, "id", Seq(0.5, 0.3)))
    intercept[IllegalArgumentException](Sampling.hashSplit(ids, "id", Nil))
    intercept[IllegalArgumentException](Sampling.hashSplit(ids, "id", Seq(1.2, -0.2)))
  }

  test("temperatureMixture: alpha flattens shares, integers exact, zero strata dropped") {
    val docs = Seq(("big", 8100L), ("big", 0L), ("small", 100L), ("empty", 0L))
      .toDF("src", "n")
    val flat = Sampling.temperatureMixture(docs, "n", "src", alpha = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // sqrt weights: 90 vs 10 -> shares 9000 / 1000 per-myriad
    assert(flat("big") == ((8100L, 90000000L, 9000L)))
    assert(flat("small") == ((100L, 10000000L, 1000L)))
    assert(!flat.contains("empty"))
    // alpha = 1 keeps natural proportions: 8100/8200 vs 100/8200
    val nat = Sampling.temperatureMixture(docs, "n", "src", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(nat("big") == 8100L * 10000 / 8200 && nat("small") == 100L * 10000 / 8200)
    // flattening: alpha 0.5 gives the small source a larger share
    assert(flat("small")._3 > nat("small"))
    intercept[IllegalArgumentException](Sampling.temperatureMixture(docs, "n", "src", 0.0))
  }

  test("weightedSampleAgg: identical membership and ranks to the window path") {
    val rows = (0L until 300L).map(i => (s"s${i % 3}", i, 1L + i % 7))
      .toDF("src", "id", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("src", "id", "priority_micros", "sample_rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
    val win = canon(Sampling.weightedSample(rows, "src", "id", "w", perStratum = 7))
    val agg = canon(Sampling.weightedSampleAgg(rows, "src", "id", "w", perStratum = 7))
    assert(win == agg && win.size == 21)
    // and under adversarial partitioning
    val aggRe = canon(Sampling.weightedSampleAgg(rows.repartition(13), "src", "id", "w", 7))
    assert(aggRe == win)
  }

  test("weightedSample: per-stratum size, determinism, weight bias") {
    val rows = (0L until 400L).map { i =>
      val w = if (i % 5 == 0) 1000L else 1L // every 5th row is heavy (both strata)
      (s"s${i % 2}", i, w)
    }.toDF("src", "id", "w")
    val got = Sampling.weightedSample(rows, "src", "id", "w", perStratum = 10)
    val byStratum = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum == Map("s0" -> 10L, "s1" -> 10L))
    // determinism + layout invariance
    val a = got.select("src", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sampling.weightedSample(rows.repartition(7), "src", "id", "w", 10)
      .select("src", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
    // bias: heavy rows (10% of population, 99%+ of mass) should dominate the
    // sample far beyond their population share
    val heavy = got.filter($"w" === 1000L).count()
    assert(heavy >= 14, s"expected heavy rows to dominate, got $heavy/20")
    // sub-1 weights are filtered, not inverted
    val withZero = Seq(("a", 1L, 0L), ("a", 2L, 5L)).toDF("src", "id", "w")
    val z = Sampling.weightedSample(withZero, "src", "id", "w", 5)
    assert(z.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[IllegalArgumentException](Sampling.weightedSample(rows, "src", "id", "w", 0))
  }

  test("stratifiedSample: exact per-stratum quotas, deterministic, layout-invariant") {
    val rows = (0L until 100L).map(i => (s"s${i % 4}", i)).toDF("src", "id")
    val got = Sampling.stratifiedSample(rows, "src", "id", frac = 0.2, salt = "t1")
    // 4 strata x 25 rows, ceil(25 * 0.2) each (float-faithful, same value
    // any IEEE engine computes)
    val quota = math.ceil(25 * 0.2).toLong
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("s0" -> quota, "s1" -> quota, "s2" -> quota, "s3" -> quota))
    // ranks are 1..quota within each stratum
    assert(got.filter($"sample_rank" > quota).isEmpty)
    // same membership regardless of partition layout; salt re-rolls it
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(Sampling.stratifiedSample(rows.repartition(7), "src", "id", 0.2, "t1")) ==
      ids(got))
    assert(ids(Sampling.stratifiedSample(rows, "src", "id", 0.2, "t2")) != ids(got))
    // frac = 1 keeps everything; bad fracs rejected
    assert(Sampling.stratifiedSample(rows, "src", "id", 1.0).count() == 100)
    intercept[IllegalArgumentException](Sampling.stratifiedSample(rows, "src", "id", 0.0))
    intercept[IllegalArgumentException](Sampling.stratifiedSample(rows, "src", "id", 1.5))
    // NULL sample keys fail loudly (null digests sort FIRST here but LAST
    // in most SQL engines — a silent membership divergence otherwise)
    val withNull = rows.unionByName(
      Seq(("s0", Option.empty[Long])).toDF("src", "id"))
    val ex = intercept[Exception] {
      Sampling.stratifiedSample(withNull, "src", "id", 0.2, "t1").collect()
    }
    assert(ex.getMessage.contains("non-null") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("mixtureSelect: weighted quotas, greedy deterministic membership") {
    // stratum A: 5 docs x 2 tokens (total 10, w=1); B: 5 x 2 (total 10, w=2)
    // -> B = min(10/1, 10/2) = 5 -> quota A = 5 tokens, quota B = 10
    val rows = ((1L to 5L).map(i => ("A", i, 2L)) ++
      (11L to 15L).map(i => ("B", i, 2L))).toDF("src", "id", "sz")
    val weight = when($"src" === "A", 1L).otherwise(2L)
    val kept = Sampling.mixtureSelect(rows, "sz", "id", "src", weight, salt = "m1")
    val bySrc = kept.groupBy("src")
      .agg(count(lit(1)).as("n"), sum("sz").as("tok"), max("mix_quota").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // A fits 2 whole docs under 5 tokens; B fits all 5 under 10
    assert(bySrc("A") == ((2L, 4L, 5L)))
    assert(bySrc("B") == ((5L, 10L, 10L)))
    // deterministic: same membership across runs and layouts
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids(Sampling.mixtureSelect(rows.repartition(5), "sz", "id", "src", weight, "m1")) ==
      ids(kept))
    // cum_size never exceeds the quota on any kept row
    assert(kept.filter($"cum_size" > $"mix_quota").isEmpty)
  }

  test("chunkDocuments: window layout, boundaries, degenerate docs") {
    def toks(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, toks(4)),   // n == size -> one full chunk
      (2L, toks(5)),   // n == size+1 -> chunks [1..4], [4..5]
      (3L, toks(10)),  // 1 + ceil((10-4)/3) = 3 chunks
      (4L, toks(2)),   // shorter than size -> one short chunk
      (5L, "   ")      // token-less -> dropped
    ).toDF("doc_id", "text")
    val got = Sampling.chunkDocuments(docs, "text", "doc_id", size = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got == Map(
      (1L, 0L) -> ((4L, "t1", "t4")),
      (2L, 0L) -> ((4L, "t1", "t4")), (2L, 1L) -> ((2L, "t4", "t5")),
      (3L, 0L) -> ((4L, "t1", "t4")), (3L, 1L) -> ((4L, "t4", "t7")),
      (3L, 2L) -> ((4L, "t7", "t10")),
      (4L, 0L) -> ((2L, "t1", "t2"))))
    // every token index is covered by some chunk (stride <= size)
    intercept[IllegalArgumentException](
      Sampling.chunkDocuments(docs, "text", "doc_id", size = 4, stride = 5))
    intercept[IllegalArgumentException](
      Sampling.chunkDocuments(docs, "text", "doc_id", size = 0, stride = 1))
  }

  test("packBins: offset-quantized packing per partition group") {
    val docs = Seq(
      // group a: sizes 60,60,60 with budget 100 -> offsets 0,60,120 -> bins 0,0,1
      ("a", 1L, 60L), ("a", 2L, 60L), ("a", 3L, 60L),
      // group b: a 250-size row spans bins alone -> offsets 0,250 -> bins 0,2
      ("b", 1L, 250L), ("b", 2L, 10L)
    ).toDF("src", "ord", "n")
    val got = Sampling.packBins(docs, "n", "ord", Seq("src"), budget = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("b", 1L) -> 0L, ("b", 2L) -> 2L))
    // deterministic under repartitioning
    val re = Sampling.packBins(docs.repartition(5), "n", "ord", Seq("src"), 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(re == got)
    intercept[IllegalArgumentException](Sampling.packBins(docs, "n", "ord", Nil, 100))
  }

  test("quotaSample: scarcest category caps the scale; mix hits targets; deterministic") {
    import graft.operators.Sampling
    // A: 10 rows available, B: 2 rows; 50/50 targets -> scale =
    // min(20, 4) = 4 -> quota 2 + 2
    val df = ((1L to 10L).map(i => (i, "A")) ++ Seq((100L, "B"), (101L, "B")))
      .toDF("k", "ty")
    val out = Sampling.quotaSample(df, "ty", "k",
      Seq("A" -> 5000L, "B" -> 5000L), salt = "|s")
    val byTy = out.collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byTy == Map("A" -> 2, "B" -> 2))
    // membership is content-determined: a rerun picks the same rows
    val again = Sampling.quotaSample(df, "ty", "k",
      Seq("A" -> 5000L, "B" -> 5000L), salt = "|s")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq ==
      again.collect().map(_.getLong(0)).sorted.toSeq)
    // uncovered categories drop; bad targets fail loudly
    val withC = df.union(Seq((999L, "C")).toDF("k", "ty"))
    assert(!Sampling.quotaSample(withC, "ty", "k",
      Seq("A" -> 5000L, "B" -> 5000L), "|s")
      .collect().map(_.getString(1)).contains("C"))
    intercept[IllegalArgumentException](Sampling.quotaSample(
      df, "ty", "k", Seq("A" -> 5000L), "|s"))
  }
}

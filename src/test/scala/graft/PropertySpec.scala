package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{Coerce, Dedup, Normalize}
import graft.util.Names

/** Property-style invariants (SURVEY §5.3). Inputs are ScalaCheck-generated
  * with a fixed seed, evaluated in batched DataFrames (one Spark job per
  * property, not per case). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val asciiWord: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  test("decamelize is idempotent and lowercase") {
    val inputs = sample(Gen.listOfN(3, asciiWord).map(_.mkString("")), 200)
    inputs.foreach { s =>
      val once = Names.decamelize(s)
      assert(Names.decamelize(once) == once, s"not idempotent for $s")
      assert(once == once.toLowerCase)
    }
  }

  test("event-name normalization: column impl == driver impl on random strings") {
    val weird = Gen.oneOf(asciiWord, Gen.oneOf("&", " ", "A B", "xY", "S&P", "a1B2c"))
    val inputs = sample(Gen.listOfN(4, weird).map(_.mkString(" ")), 100)
    val viaCol = inputs.toDF("e")
      .select(Normalize.normalizeEventNameCol(col("e")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(viaCol == inputs.map(Names.normalizeEventName))
  }

  test("coercion conservation: |misfits| == cells nulled, for any value mix") {
    val cell: Gen[String] = Gen.oneOf(
      Gen.chooseNum(-1000000L, 1000000L).map(_.toString), // castable
      asciiWord.suchThat(s => s.exists(_.isLetter)),       // misfit
      Gen.const(null: String))                             // null: no misfit
    val rows = sample(cell, 500).zipWithIndex.map { case (v, i) => (s"m$i", v) }
    val df = rows.toDF("message_id", "payload")
    val target = StructType(Seq(
      StructField("message_id", StringType), StructField("payload", LongType)))
    val r = Coerce.coerce(df, target, "t", persistIntermediate = false)
    val expectedMisfits = rows.count { case (_, v) =>
      v != null && scala.util.Try(v.toLong).isFailure
    }
    assert(r.misfits.count() == expectedMisfits)
    assert(r.main.filter(col("payload").isNull).count() ==
      rows.count { case (_, v) => v == null } + expectedMisfits)
  }

  test("deterministic dedup is a projection fixpoint (ingest twice == once)") {
    val rows = sample(for {
      k <- Gen.chooseNum(0, 20)
      v <- Gen.chooseNum(0L, 1000L)
      p <- asciiWord
    } yield (k, v, p), 300)
    val df = rows.toDF("k", "v", "p")
    val once  = Dedup.dedupDeterministic(df, Seq("k"), Seq(col("v").desc, col("p").desc))
    val twice = Dedup.dedupDeterministic(
      once.unionByName(df), Seq("k"), Seq(col("v").desc, col("p").desc))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("last-write-wins matches reference reduction on the driver") {
    val rows = sample(for {
      u <- Gen.chooseNum(0, 15)
      ver <- Gen.chooseNum(0L, 50L)
      m <- asciiWord
    } yield (u.toString, ver, m), 200)
    val expected = rows.groupBy(_._1).map { case (u, g) =>
      u -> g.maxBy(r => (r._2, r._3))._3
    }
    val got = Dedup.lastWriteWins(rows.toDF("user_id", "ver", "message_id"),
        Seq("user_id"), "ver", Seq(col("message_id").desc))
      .collect().map(r => r.getAs[String]("user_id") -> r.getAs[String]("message_id")).toMap
    assert(got == expected)
  }

  test("flatten preserves row count and leaf values on generated nested JSON") {
    val leaf = Gen.chooseNum(0, 999)
    val objs = sample(for {
      a <- leaf; b <- leaf; c <- leaf; n <- Gen.chooseNum(0, 3)
    } yield (a, b, c, n), 100)
    val lines = objs.zipWithIndex.map { case ((a, b, c, n), i) =>
      val arr = (0 until n).map(j => s"""{"sku":"s$j"}""").mkString(",")
      s"""{"id":$i,"outerKey":{"innerVal":$a,"deep":{"x":$b}},"countVal":$c,"items":[$arr]}"""
    }
    val flat = graft.ingest.JsonFlatten.flatten(spark.read.json(lines.toDS))
    assert(flat.count() == objs.length)
    assert(flat.columns.contains("outer_key_inner_val"))
    assert(flat.columns.contains("outer_key_deep_x"))
    val maxN = objs.map(_._4).max
    (0 until maxN).foreach(j => assert(flat.columns.contains(s"items_${j}_sku")))
    val sums = flat.agg(sum("outer_key_inner_val"), sum("outer_key_deep_x"), sum("count_val"))
      .head()
    assert(sums.getLong(0) == objs.map(_._1.toLong).sum)
    assert(sums.getLong(1) == objs.map(_._2.toLong).sum)
    assert(sums.getLong(2) == objs.map(_._3.toLong).sum)
  }

  test("asofJoin matches a driver-side reference on random series") {
    val gen = for {
      key <- Gen.chooseNum(0, 5)
      t <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(0L, 999L)
    } yield (key.toLong, t, v)
    // dedup right rows per (key, t) — the operator's documented contract
    val rightRows = sample(gen, 60).groupBy(r => (r._1, r._2))
      .map(_._2.maxBy(_._3)).toSeq
    val leftRows = sample(gen, 80).map(r => (r._1, r._2, r._3)).distinct
    val out = graft.operators.AsofJoin.asofJoin(
        leftRows.toDF("k", "t", "payload"), rightRows.toDF("k", "t", "rv"),
        Seq("k"), "t", Seq("rv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    leftRows.foreach { case (k, t, p) =>
      val expect = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(out((k, t, p)) == expect, s"key=$k t=$t")
    }
    assert(out.size == leftRows.size)
  }

  test("rangeJoin matches a driver-side containment scan on random data") {
    val pts = sample(for {
      id <- Gen.chooseNum(0L, 10000L); t <- Gen.chooseNum(0L, 500L)
    } yield (id, t), 60).distinct
    // interval ids made unique by index: two intervals sharing an id but
    // not a range would legitimately emit identical projected rows and
    // fool the duplicate check below
    val ivs = sample(for {
      s0 <- Gen.chooseNum(0L, 480L); len <- Gen.chooseNum(0L, 120L)
    } yield (s0, s0 + len), 40).zipWithIndex
      .map { case ((s0, e0), i) => (i.toLong, s0, e0) }
    val gotRows = graft.operators.RangeJoin.rangeJoin(
        pts.toDF("pid", "t"), "t", ivs.toDF("iid", "s", "e"), "s", "e", binSize = 37)
      .select("pid", "t", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // a pair meets in exactly ONE bin — duplicate emission is a bug the
    // set comparison alone would mask
    assert(gotRows.length == gotRows.distinct.length)
    val expected = (for {
      (pid, t) <- pts; (iid, s, e) <- ivs if s <= t && t <= e
    } yield (pid, t, iid)).toSet
    assert(gotRows.toSet == expected)
  }

  test("dupClusters matches a driver-side union-find on random graphs") {
    // one distributed run over the union of several generated graphs,
    // disjoint id ranges so components can't bleed between cases
    val graphs: Seq[Seq[(Long, Long)]] = (0 until 8).map { g =>
      val base = g * 1000L
      val nodes = 5 + g * 3
      sample(for {
        a <- Gen.chooseNum(0, nodes - 1)
        d <- Gen.chooseNum(1, nodes - 1)
      } yield {
        val b = (a + d) % nodes
        (base + math.min(a, b), base + math.max(a, b))
      }, 2 + g * 4).distinct
    }
    val allEdges = graphs.flatten
    val got = graft.operators.NearDup.dupClusters(allEdges.toDF("id_a", "id_b"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap

    // oracle: plain union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    allEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(v => v -> find(v)).toMap
    assert(got == expected)
  }

  test("waterFill is always feasible: alloc in [0, cap], total within budget, saturation consistent") {
    import graft.operators.BudgetAlloc
    val stratum = for {
      cap <- Gen.chooseNum(0L, 5000L)
      w <- Gen.chooseNum(1L, 9L)
    } yield (cap, w)
    val cases = sample(Gen.zip(Gen.listOfN(12, stratum), Gen.chooseNum(1L, 30000L)), 12)
    for (((strata, budget), i) <- cases.zipWithIndex) {
      val df = strata.zipWithIndex.map { case ((c, w), j) => (s"s$j", c, w) }
        .toDF("s", "cap", "weight")
      val out = BudgetAlloc.waterFill(df, "s", "cap", "weight",
          Seq(budget).toDF("b"))
        .collect().map(r => (r.getLong(1), r.getBoolean(3), r.getLong(4)))
      out.foreach { case (cap, sat, alloc) =>
        assert(alloc >= 0L && alloc <= cap, s"case $i: alloc bound")
        assert(!sat || alloc == cap, s"case $i: saturated means full cap")
      }
      assert(out.map(_._3).sum <= budget, s"case $i: over-commit")
      // if anything is unsaturated the budget must be ~spent (within one
      // truncation unit per stratum) OR every unsaturated alloc hit cap
      val totalCap = out.map(_._1).sum
      if (totalCap <= budget)
        assert(out.forall(_._2), s"case $i: budget covers caps -> all saturated")
    }
  }

  test("Gini stays in [0, 10000) and responds to concentration") {
    import graft.operators.Profile
    val masses = sample(Gen.listOfN(30, Gen.chooseNum(0L, 200L)), 10)
    for ((ms, i) <- masses.zipWithIndex if ms.sum > 0) {
      val df = ms.zipWithIndex.map { case (m, j) => (s"g", m) }.toDF("g", "y")
      val gini = Profile.giniIndex(df, "g", "y").collect()(0).getLong(3)
      assert(gini >= 0L && gini < 10000L, s"case $i: gini=$gini")
    }
  }

  test("conformal coverage meets the 1-alpha target on exchangeable integer scores") {
    import graft.operators.Conformal
    // deterministic pseudo-random residuals via a hash mix: exchangeable
    // between the md5 calibration/test splits by construction
    val rows = (1L to 4000L).map { k =>
      val r = (k * 2654435761L) % 97L // arbitrary 97-value score domain
      (k, 100L + r, 100L)
    }
    val Array(out) = Conformal.coverageReport(
      rows.toDF("k", "y", "y_hat").withColumn("g", lit("all")),
      "k", "y", "y_hat", Seq("g"), alphaNum = 1, alphaDen = 10, salt = "pp")
      .collect()
    val pm = out.getAs[Long]("coverage_pm")
    assert(pm >= 8800L, s"coverage_pm=$pm must sit at/above ~90%")
  }

  test("dispersion of a constant-rate feed is below the burst flag; a planted burst trips it") {
    import graft.operators.Profile
    val calm = (1 to 400).map(i => ("calm", 3L + (i % 2)))
    val bursty = (1 to 399).map(_ => ("burst", 1L)) :+ (("burst", 400L))
    val out = Profile.dispersionIndex((calm ++ bursty).toDF("g", "y"), "g", "y")
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(!out("calm") && out("burst"))
  }

  test("triangle census invariants: 3*triangles <= wedges on random graphs") {
    import graft.operators.Graph
    val edgeGen = Gen.zip(Gen.chooseNum(1L, 25L), Gen.chooseNum(1L, 25L))
    for (seed <- 1 to 3) {
      val es = sample(Gen.listOfN(120, edgeGen), seed * 7).flatten
        .filter { case (a, b) => a != b }
      if (es.nonEmpty) {
        val r = Graph.triangleStats(es.toDF("s", "d"), "s", "d").collect()(0)
        val (wedges, tri) = (r.getLong(2), r.getLong(3))
        assert(3L * tri <= wedges, s"3*$tri <= $wedges")
        assert(r.getLong(4) >= 0L && r.getLong(4) <= 10000L)
      }
    }
  }
}

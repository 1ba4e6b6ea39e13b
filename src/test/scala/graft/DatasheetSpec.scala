package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Concentration, Datasheet}

class DatasheetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("datasheet hand frame: cross-source dups count, per-group rates, Simpson") {
    // fp "A" recurs across s1 and s2 -> BOTH docs are dup-exposed even
    // though each source holds it once; s1 is lang-uniform (simpson 0),
    // s2 splits 2/1 en/de -> 1 - (4+1)/9 = 4444 pm.
    val df = Seq(
      ("s1", "A", 10L, true, "en", "en"),
      ("s1", "B", 20L, false, "en", "de"),
      ("s2", "A", 30L, true, "en", "en"),
      ("s2", "C", 40L, true, "en", "en"),
      ("s2", "D", 50L, true, "de", "de"))
      .toDF("src", "fp", "tc", "qok", "la", "lb")
    val got = Datasheet.corpusDatasheet(df, "src", "fp", "tc", "qok", "la", "lb")
      .collect().map(r => r.getAs[String]("src") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("dup_docs"), r.getAs[Long]("quality_fail_docs"),
          r.getAs[Long]("lang_mismatch_docs"),
          r.getAs[Long]("lang_simpson_pm")))).toMap
    assert(got("s1") == ((2L, 30L, 1L, 1L, 1L, 0L)))
    assert(got("s2") == ((3L, 120L, 1L, 0L, 0L, 4444L)))
  }

  test("datasheetFromCells: cells + dup rollup equal corpusDatasheet; absent dup groups read 0") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("s1", "A", 10L, true, "en", "en"),
      ("s1", "B", 20L, false, "en", "de"),
      ("s2", "A", 30L, true, "en", "en"),
      ("s2", "C", 40L, true, "en", "en"),
      ("s2", "D", 50L, true, "de", "de"))
      .toDF("src", "fp", "tc", "qok", "la", "lb")
    val cells = Datasheet.datasheetCells(df, "src", "tc", "qok", "la", "lb")
    val fpc = df.groupBy("fp").agg(count(lit(1)).as("fc"))
    val dup = df.join(fpc, "fp").groupBy(col("src"))
      .agg(sum(when(col("fc") >= 2, 1L).otherwise(0L)).as("dup_docs"))
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getAs[String]("src") -> r.toSeq.tail).toMap
    val fromCells = canon(Datasheet.datasheetFromCells(cells, dup, "src", "la", "lb"))
    val batch = canon(Datasheet.corpusDatasheet(df, "src", "fp", "tc", "qok", "la", "lb"))
    assert(fromCells == batch)
    // a group absent from the dup rollup (no recurrence observed) reads 0
    val partial = canon(Datasheet.datasheetFromCells(
      cells, dup.filter(col("src") === "s2"), "src", "la", "lb"))
    assert(partial("s2") == batch("s2"))
    assert(partial("s1")(2) == 0L && partial("s1")(3) == 0L) // dup_docs, dup_pm
  }

  test("datasheet permyriads truncate and a clean group reads zeros") {
    val df = Seq(
      ("s", "X", 5L, true, "en", "en"),
      ("s", "Y", 5L, true, "en", "en"),
      ("s", "Z", 5L, true, "en", "en"))
      .toDF("src", "fp", "tc", "qok", "la", "lb")
    val r = Datasheet.corpusDatasheet(df, "src", "fp", "tc", "qok", "la", "lb")
      .collect().head
    assert(r.getAs[Long]("dup_pm") == 0L)
    assert(r.getAs[Long]("quality_fail_pm") == 0L)
    assert(r.getAs[Long]("lang_mismatch_pm") == 0L)
    assert(r.getAs[Long]("lang_simpson_pm") == 0L)
  }

  test("dedupYield hand frame: size histogram, keep-the-longest survivorship, savings") {
    // fp A x3 (weights 10,12,8 -> keep 12), fp B x2 (5,5 -> keep 5),
    // fp E x2 (2,1 -> keep 2, non-exact ratio), fps C,D unique
    val df = Seq(("A", 10L), ("A", 12L), ("A", 8L), ("B", 5L), ("B", 5L),
      ("E", 2L), ("E", 1L), ("C", 7L), ("D", 9L)).toDF("fp", "w")
    val got = Datasheet.dedupYield(df, "fp", "w").collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("tokens_total"), r.getAs[Long]("tokens_kept"),
          r.getAs[Long]("savings_pm")))).toMap
    assert(got(1L) == ((2L, 2L, 16L, 16L, 0L)))
    // size 2: totals 10+3, kept 5+2 -> savings 10000*6/13 = 4615
    // TRUNCATED toward zero (the old kept-ratio form read 4616 — the
    // savings ratio, not the kept ratio, is what truncates)
    assert(got(2L) == ((2L, 4L, 13L, 7L, 4615L)))
    // size 3: total 30, kept 12 -> savings 10000*18/30 = 6000
    assert(got(3L) == ((1L, 3L, 30L, 12L, 6000L)))
    assert(got.size == 3)
  }

  test("gini: perfectly equal weights read 0, a single holder reads (n-1)/n") {
    val eq = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("k", "w")
    val r1 = Concentration.gini(eq, "k", "w", "eq").collect().head
    assert(r1.getAs[Long]("gini_pm") == 0L)
    assert(r1.getAs[Long]("top1_pm") == 2500L)
    // one key holds everything: G = (n-1)/n = 7500 pm at n=4
    val one = Seq(("a", 40L), ("b", 0L), ("c", 0L), ("d", 0L)).toDF("k", "w")
    val r2 = Concentration.gini(one, "k", "w", "one").collect().head
    assert(r2.getAs[Long]("gini_pm") == 7500L)
    assert(r2.getAs[Long]("top1_pm") == 10000L)
  }

  test("gini hand frame matches the mean-absolute-difference identity") {
    // weights 1,2,3,4: sum |xi-xj| over ordered pairs = 1+2+3+1+2+1=10,
    // doubled = 20; G = 20 / (2*4*10) = 0.25 -> 2500 pm; top1 = 4/10.
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "w")
    val r = Concentration.gini(df, "k", "w", "hand").collect().head
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("total_w") == 10L)
    assert(r.getAs[Long]("max_w") == 4L)
    assert(r.getAs[Long]("gini_pm") == 2500L)
    assert(r.getAs[Long]("top1_pm") == 4000L)
    assert(r.getAs[Long]("top5_pm") == 10000L) // only 4 keys: all of them
  }

  test("gini matches the brute-force pair identity on random weights") {
    val rnd = new scala.util.Random(17)
    (1 to 5).foreach { trial =>
      val ws = Vector.fill(12)(rnd.nextInt(1000).toLong + 1L)
      val df = ws.zipWithIndex.map { case (w, i) => (s"k$i", w) }.toDF("k", "w")
      val r = Concentration.gini(df, "k", "w", "rnd").collect().head
      val ad = (for (i <- ws.indices; j <- ws.indices) yield
        math.abs(ws(i) - ws(j))).sum
      val want = 10000L * ad / (2L * ws.size * ws.sum)
      assert(r.getAs[Long]("gini_pm") == want, s"trial $trial")
      assert(r.getAs[Long]("top5_pm") ==
        10000L * ws.sorted.reverse.take(5).sum / ws.sum, s"trial $trial")
    }
  }

  test("gini: the domain contract fails loudly past maxKeys") {
    val big = (1 to 50).map(i => (s"k$i", 1L)).toDF("k", "w")
    intercept[IllegalArgumentException](
      Concentration.gini(big, "k", "w", "big", maxKeys = 10))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("charSymbols splits into single characters with no empties") {
    val got = Seq(Tuple1("abc"), Tuple1("x"))
      .toDF("w").select(BpeTrain.charSymbols(col("w")))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a", "b", "c") && got(1) == Seq("x"))
  }

  test("pairCounts: per-position counting weighted by freq; single-symbol words excluded") {
    val vocab = Seq(
      (Seq("a", "a", "a"), 2L), // pairs (a,a) at 2 positions × freq 2 = 4
      (Seq("a", "b"), 3L),
      (Seq("z"), 99L) // no pairs
    ).toDF("symbols", "freq")
    val got = BpeTrain.pairCounts(vocab)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", "a") -> 4L, ("a", "b") -> 3L))
  }

  test("mergeOnce is greedy leftmost: aaa + (a,a) -> [aa, a]") {
    val got = Seq(Tuple1(Seq("a", "a", "a")), Tuple1(Seq("b", "a", "a")),
        Tuple1(Seq("a", "b")), Tuple1(Seq.empty[String]))
      .toDF("symbols")
      .select(BpeTrain.mergeOnce(col("symbols"), "a", "a"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("aa", "a"))
    assert(got(1) == Seq("b", "aa"))
    assert(got(2) == Seq("a", "b"))
    assert(got(3) == Seq.empty)
  }

  test("learnMerges replays the classic low/lower/newest/widest example") {
    // Sennrich et al. (2016) §3.2 vocabulary: low×5, lower×2, newest×6,
    // widest×3 (no end-of-word marker in this simplified setting).
    // Hand-computed: round 1 best pair is (e,s) cnt 9 (newest 6 +
    // widest 3); round 2 (es,t) 9; round 3 (l,o) 7 (low 5 + lower 2).
    val docs = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val merges = BpeTrain.learnMerges(docs, "text", rounds = 3)
    assert(merges == Seq(("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
    // and it stops early once no pair reaches minCount
    val tiny = Seq(("ab cd")).toDF("text")
    assert(BpeTrain.learnMerges(tiny, "text", rounds = 5, minCount = 2L).isEmpty)
  }

  test("replace-encoding applyMerge ≡ mergeOnce symbol fold, including adversarial substrings") {
    // the cases that break naive string-replace encodings:
    //  [des, t] under (es, t): "es" is a SUFFIX of symbol "des" — the
    //    anchored encoding must NOT merge;
    //  [a, bc] under (a, b): "b" is a PREFIX of "bc" — must not merge;
    //  [a, a, a, a] under (a, a): greedy leftmost gives [aa, aa];
    //  [es, t] under (es, t): the real merge fires
    val cases = Seq(
      Seq("des", "t") -> ("es", "t"),
      Seq("a", "bc") -> ("a", "b"),
      Seq("a", "a", "a", "a") -> ("a", "a"),
      Seq("a", "a", "a") -> ("a", "a"),
      Seq("es", "t") -> ("es", "t"))
    cases.foreach { case (syms, (a, b)) =>
      val df = Seq(Tuple1(syms)).toDF("symbols")
      val viaFold = df.select(BpeTrain.mergeOnce(col("symbols"), a, b))
        .head().getSeq[String](0)
      val viaReplace = df.select(BpeTrain.pieces(
          BpeTrain.applyMerge(BpeTrain.encodeSymbols(col("symbols")), a, b)))
        .head().getString(0)
      assert(viaReplace == viaFold.mkString("|"),
        s"mismatch for $syms under ($a,$b)")
    }
    // piece count arithmetic agrees with the fold's length
    val enc = BpeTrain.applyMerge(
      BpeTrain.encodeSymbols(typedLit(Seq("a", "a", "a"))), "a", "a")
    val r = spark.range(1).select(BpeTrain.pieceCount(enc), BpeTrain.pieces(enc)).head()
    assert(r.getLong(0) == 2L && r.getString(1) == "aa|a")
  }

  test("learnMerges ties break deterministically on (a, b)") {
    // every pair occurs exactly twice -> ties everywhere; the argmax
    // must be the lexicographically first pair, round after round
    val docs = Seq(("zy zy ab ab")).toDF("text")
    val merges = BpeTrain.learnMerges(docs, "text", rounds = 2)
    assert(merges.head._1 == "a" && merges.head._2 == "b")
    assert(merges == Seq(("a", "b", 2L), ("z", "y", 2L)))
  }

  test("fertility: merges learned on the majority group segment it better") {
    // 'ab' dominates the corpus, so 'a'+'b' merges; group M (all 'ab')
    // reaches fertility 1 piece/word, group X ('cd' words, never
    // merged) stays at 2 — and chars >= pieces >= words throughout
    val docs = (Seq.fill(6)(("M", "ab ab ab")) ++ Seq.fill(2)(("X", "cd cd")))
      .toDF("grp", "text")
    val out = BpeTrain.fertilityByGroup(docs, "text", "grp", rounds = 1)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("M").getAs[Long]("fertility_pm") == 10000L)
    assert(out("X").getAs[Long]("fertility_pm") == 20000L)
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_chars") >= r.getAs[Long]("n_pieces"))
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_words"))
    }
  }
}

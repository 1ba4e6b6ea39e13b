package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).head().getAs[T]("v")

  test("repetition stats: exact gram/distinct/repeated counts") {
    def rep(text: String): (Long, Long, Long) = {
      val r = Seq(text).toDF("t")
        .select(graft.plans.TextFunctions.repetitionStats(
          TextAnalysis.tokens(col("t")), 2).as("r"))
        .select("r.n_grams", "r.n_distinct_grams", "r.n_repeated").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // "a b a b a": grams [a b, b a, a b, b a] -> 4 total, 2 distinct, all repeated
    assert(rep("a b a b a") == ((4L, 2L, 4L)))
    // no repetition: every gram unique
    assert(rep("a b c d") == ((3L, 3L, 0L)))
    // one duplicated gram among distinct ones: [x y, y x, x y] -> the two
    // "x y" instances count as repeated, the lone "y x" does not
    assert(rep("x y x y") == ((3L, 2L, 2L)))
    // shorter than n -> all zeros (and no throw)
    assert(rep("solo") == ((0L, 0L, 0L)))
    assert(rep("") == ((0L, 0L, 0L)))
    // SQL-surface hardening: null elements are dropped, not an NPE;
    // n < 1 is rejected at construction
    val viaNulls = Seq(1).toDF("x")
      .select(graft.plans.TextFunctions.repetitionStats(
        array(lit("a"), lit(null).cast("string"), lit("a"), lit("b"),
          lit("a"), lit("b")), 2).as("r"))
      .select("r.n_grams", "r.n_distinct_grams", "r.n_repeated").head()
    // surviving tokens [a,a,b,a,b] -> grams [aa, ab, ba, ab]
    assert((viaNulls.getLong(0), viaNulls.getLong(1), viaNulls.getLong(2)) == ((4L, 3L, 2L)))
    intercept[IllegalArgumentException] {
      graft.plans.TextFunctions.repetitionStats(col("t"), 0)
    }
  }

  test("bigram entropy stats: exact pieces, codepoints, degenerate strings") {
    def bg(text: String): (Long, Long, Long) = {
      val r = Seq(text).toDF("t")
        .select(graft.plans.TextFunctions.bigramEntropyStats(col("t")).as("r"))
        .select("r.n_bigrams", "r.n_distinct", "r.s_micros").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // "aaaa": bigrams [aa, aa, aa] -> 3 total, 1 distinct,
    // s = floor(3 * ln(3) * 1e6 + 0.5)
    assert(bg("aaaa") == ((3L, 1L, math.floor(3.0 * math.log(3.0) * 1e6 + 0.5).toLong)))
    // all-distinct bigrams: every count 1, ln(1) = 0 -> s = 0
    assert(bg("abcd") == ((3L, 3L, 0L)))
    // "abab": [ab, ba, ab] -> ab x2, ba x1
    assert(bg("abab") == ((3L, 2L, math.floor(2.0 * math.log(2.0) * 1e6 + 0.5).toLong)))
    // shorter than 2 codepoints -> zeros; supplementary-plane codepoints
    // count as ONE character each (SQL substring semantics)
    assert(bg("x") == ((0L, 0L, 0L)))
    assert(bg("") == ((0L, 0L, 0L)))
    val gclef = new String(Character.toChars(0x1D11E)) // U+1D11E, surrogate pair
    assert(bg(gclef + "a" + gclef) == ((2L, 2L, 0L)))
    // high entropy separates from low at equal length
    def h(text: String): Long = {
      val (n, _, s) = bg(text)
      math.floor(math.log(n.toDouble) * 1e6 + 0.5).toLong - s / n
    }
    assert(h("abcdefgh") > h("aaaaaaaa"))
    assert(h("aaaaaaaa") == 0L) // single repeated bigram: zero entropy
  }

  test("token count: empties, whitespace runs, trim") {
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "a b  c") == 3)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "   ") == 0)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "") == 0)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), " x ") == 1)
  }

  test("subword count splits on class boundaries") {
    // don | ' | t | stop | 2 | day
    assert(one[Int](TextAnalysis.subwordCount(col("t")), "don't stop2day") == 6)
    assert(one[Int](TextAnalysis.subwordCount(col("t")), "") == 0)
    assert(one[Int](TextAnalysis.subwordCount(col("t")), "!!") == 2) // puncts split singly
    assert(one[Int](TextAnalysis.subwordCount(col("t")), "ab1cd2") == 4)
  }

  test("subword run-count column == plain-Scala piece count") {
    // ground truth computed driver-side: pieces of a class-boundary split
    // are exactly the maximal letter runs, maximal digit runs, and one
    // piece per other non-whitespace char. (The retired lookaround split
    // was NOT a valid reference: its zero-width lookbehind could match
    // before the \s+ alternative consumed following whitespace, so "!\t"
    // counted the tab as a piece.)
    def expected(s: String): Int = {
      val t = s.toLowerCase
      def runs(p: Char => Boolean): Int =
        t.zipWithIndex.count { case (ch, i) => p(ch) && (i == 0 || !p(t(i - 1))) }
      val ws = " \t\n\r\f"
      runs(c => c >= 'a' && c <= 'z') + runs(c => c >= '0' && c <= '9') +
        t.count(c => !(c >= 'a' && c <= 'z') && !(c >= '0' && c <= '9') && !ws.contains(c))
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "abz 09!,.-_'\"\t\n(){}éA"
    val samples = Seq.tabulate(300)(_ =>
      Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = samples.toDF("t")
      .select(col("t"), TextAnalysis.subwordCount(col("t")).cast("int").as("a"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    samples.distinct.foreach { s =>
      assert(got(s) == expected(s), s"for ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("char class counts") {
    assert(one[Int](TextAnalysis.nPunct(col("t")), "a,b.c!") == 3)
    assert(one[Int](TextAnalysis.nDigits(col("t")), "a1b22") == 3)
  }

  test("langId picks profile with most hits; und when none") {
    assert(one[String](TextAnalysis.langId(col("t")), "the cat is on the mat") == "en")
    assert(one[String](TextAnalysis.langId(col("t")), "el gato en la casa de los perros") == "es")
    assert(one[String](TextAnalysis.langId(col("t")), "qwerty zxcvb") == "und")
  }

  test("quality gate rejects too-short and too-repetitive docs") {
    assert(!one[Boolean](TextAnalysis.qualityOk(col("t")), "hi"))
    val repetitive = Seq.fill(100)("spam").mkString(" ")
    assert(!one[Boolean](TextAnalysis.qualityOk(col("t")), repetitive))
    assert(one[Boolean](TextAnalysis.qualityOk(col("t")),
      "a reasonable document with plenty of distinct words in it"))
  }

  test("fingerprints: canonical md5 ignores case/extra whitespace, rolling is order-sensitive") {
    val a = one[String](TextAnalysis.canonicalFingerprint(col("t")), "Hello  World")
    val b = one[String](TextAnalysis.canonicalFingerprint(col("t")), "hello world")
    assert(a == b)
    val r1 = one[Long](TextAnalysis.rollingFingerprint(col("t")), "a b c")
    val r2 = one[Long](TextAnalysis.rollingFingerprint(col("t")), "c b a")
    assert(r1 != r2)
  }

  test("portable rolling fingerprint: order-sensitive, seed-exact, chain-checkable") {
    val p1 = one[Long](TextAnalysis.portableRollingFingerprint(col("t")), "a b c")
    val p2 = one[Long](TextAnalysis.portableRollingFingerprint(col("t")), "c b a")
    assert(p1 != p2)
    assert(one[Long](TextAnalysis.portableRollingFingerprint(col("t")), "") == 0L)
    // replay the chain with the public md5Long primitive: the expression
    // must equal the reference left fold over decimal-restringed steps
    def ref(toks: Seq[String]): Long = toks.foldLeft(0L) { (acc, t) =>
      graft.plans.PortableSketch.md5Long(
        (java.lang.Long.toString(acc) + "|" + t)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    assert(p1 == ref(Seq("a", "b", "c")))
    assert(p2 == ref(Seq("c", "b", "a")))
  }

  test("textStats single-pass struct matches the composable signals exactly") {
    val docs = Seq(
      "the cat is on the mat",
      "el gato en la casa de los perros",
      "Hello, World! 123 ... the the the a of to",
      "  leading and trailing   whitespace\twith\ttabs the a ",
      "",
      "   ",
      "punct!!! only??? #### $$$$",
      Seq.fill(100)("spam").mkString(" "),
      "a reasonable document with plenty of distinct words in it for the gate",
      "MIXED Case ÜNICÖDE tökens the straße"
    ).toDF("t")
    val st = TextAnalysis.textStats(col("t"))
    val mismatches = docs.select(
        st.getField("n_chars").as("a1"), TextAnalysis.nChars(col("t")).as("b1"),
        st.getField("n_tokens").as("a2"), TextAnalysis.tokenCount(col("t")).as("b2"),
        st.getField("n_punct").as("a3"), TextAnalysis.nPunct(col("t")).as("b3"),
        st.getField("n_digits").as("a4"), TextAnalysis.nDigits(col("t")).as("b4"),
        st.getField("n_distinct_tokens").as("a5"),
        size(array_distinct(TextAnalysis.tokens(col("t")))).as("b5"),
        TextAnalysis.qualityOkFromStats(st).as("a6"), TextAnalysis.qualityOk(col("t")).as("b6"),
        TextAnalysis.langIdFromStats(st).as("a7"), TextAnalysis.langId(col("t")).as("b7"))
      .filter(col("a1") =!= col("b1") || col("a2") =!= col("b2") ||
        col("a3") =!= col("b3") || col("a4") =!= col("b4") ||
        col("a5") =!= col("b5") || col("a6") =!= col("b6") || col("a7") =!= col("b7"))
    assert(mismatches.count() == 0)
    // per-profile stopword counts match stopwordCount
    TextAnalysis.LangProfiles.zipWithIndex.foreach { case ((_, words), i) =>
      val bad = docs.select(
          element_at(st.getField("n_stopwords"), i + 1).as("a"),
          TextAnalysis.stopwordCount(col("t"), words).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(bad == 0)
    }
  }

  test("shingles: n-grams in order, short docs yield empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingles(col("t"), 3).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val empty = Seq("a b").toDF("t")
      .select(TextAnalysis.shingles(col("t"), 3).as("s"))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("PII: emails and IPv4 spotted and masked, prose untouched") {
    val df = Seq(
      (1L, "write to a.b+tag@sub.example.org or ping 192.168.0.1 today"),
      (2L, "no pii here, just version 4.1 and a date 2024-01-01"),
      (3L, "two mails x@y.io z@w.co and addr 10.0.0.255")
    ).toDF("id", "text")
    val r = df.select($"id", TextAnalysis.countPii($"text").as("n"),
        TextAnalysis.redactPii($"text").as("t"))
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getString(2))).toMap
    assert(r(1) == (2, "write to <EMAIL> or ping <IP> today"))
    assert(r(2) == (0, "no pii here, just version 4.1 and a date 2024-01-01"))
    assert(r(3) == (3, "two mails <EMAIL> <EMAIL> and addr <IP>"))
  }

  test("normalizeText: urls + control chars dropped, whitespace collapsed, case folded") {
    def norm(s: String): String = one[String](TextAnalysis.normalizeText(col("t")), s)
    assert(norm("Hello   WORLD") == "hello world")
    assert(norm("see https://ex.com/a?b=1 now") == "see now")
    // uppercase scheme folds before the strip, so it is dropped too
    assert(norm("go HTTP://X.Y/Z end") == "go end")
    assert(norm("tab\there\u0001and\r\nnewline") == "tab here and newline")
    assert(norm("  padded  ") == "padded")
    // URL at end of text (no trailing separator)
    assert(norm("link http://a.b/c") == "link")
    assert(norm("") == "")
  }

  test("countUrls counts case-folded scheme matches") {
    assert(one[Int](TextAnalysis.countUrls(col("t")),
      "a https://x.y/1 b HTTP://z.w/2 c http://q.r/3") == 3)
    assert(one[Int](TextAnalysis.countUrls(col("t")), "no urls here") == 0)
  }
}

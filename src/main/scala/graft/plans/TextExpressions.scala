package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All corpus-filter text signals in ONE pass over the string.
  *
  * The composable formulation (`qualityOk(text) && langId(text)`) builds
  * an independent `filter(split(lower(trim(text)),"\\s+"), ...)` tree per
  * signal — Catalyst performs no CSE across expression references, so each
  * document is regex-tokenized 4–6 times per row, every pass interpreted
  * (higher-order functions are CodegenFallback). At corpus-filter scale
  * that multiple tokenization IS the query cost (observed: 8.1 s of a
  * 37.7 s bench at sf0.1).
  *
  * This expression tokenizes once and folds every signal into a single
  * struct: character/punct/digit counts, token count, distinct-token
  * count, and per-language stopword hit counts. Parity with the
  * composable tree is bit-exact because each step reuses the engine's own
  * primitives: `UTF8String.trim()`/`.toLowerCase()` (exactly what
  * `lower(trim(c))` evaluates), `Pattern.split(s, -1)` (exactly what
  * `split(c, "\\s+")` evaluates, empties filtered the same way), and
  * `\p{Punct}`/`[0-9]` as ASCII lookup tables (Java regex `\p{Punct}`
  * is the ASCII POSIX class).
  *
  * Output: struct<n_chars:int, n_tokens:int, n_punct:int, n_digits:int,
  * n_distinct_tokens:int, n_stopwords:array<int>> where `n_stopwords(i)`
  * is the hit count of `profiles(i)` (occurrences, not distinct — same as
  * `size(filter(tokens, array_contains(profile, t)))`).
  */
case class TextStats(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  override def prettyName: String = "graft_text_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digits", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_stopwords", ArrayType(IntegerType, containsNull = false), nullable = false)
  ))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats requires string input, got ${other.simpleString}")
  }

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  @transient private lazy val profileSets: Array[java.util.HashSet[String]] =
    profiles.map { words =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray

  def computeRow(v: UTF8String): InternalRow = {
    // raw-text character-class counts (code points, matching numChars())
    val raw = v.toString
    var nChars = 0; var nPunct = 0; var nDigits = 0
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      nChars += 1
      if (cp < 128) {
        if (TextStats.Punct(cp)) nPunct += 1
        else if (cp >= '0' && cp <= '9') nDigits += 1
      }
      i += Character.charCount(cp)
    }
    // tokens of lower(trim(text)), empties removed — engine's own primitives
    val parts = ws.split(v.trim().toLowerCase().toString, -1)
    var nTokens = 0
    val distinct = new java.util.HashSet[String]()
    val stop = new Array[Int](profileSets.length)
    var j = 0
    while (j < parts.length) {
      val t = parts(j)
      if (t.nonEmpty) {
        nTokens += 1
        distinct.add(t)
        var p = 0
        while (p < stop.length) {
          if (profileSets(p).contains(t)) stop(p) += 1
          p += 1
        }
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](
      nChars, nTokens, nPunct, nDigits, distinct.size(), new GenericArrayData(stop)))
  }

  override def nullSafeEval(v: Any): Any = computeRow(v.asInstanceOf[UTF8String])

  /** Codegen: one virtual call per row into the shared single-pass helper —
    * stays inside the WholeStageCodegen span (no fallback row buffering). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStats", this, classOf[TextStats].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.computeRow($s);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextStats {
  /** Java regex \p{Punct}: the 32 ASCII POSIX punctuation characters. */
  private val Punct: Array[Boolean] = {
    val a = new Array[Boolean](128)
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => a(c) = true)
    a
  }
}

/** Intra-document repetition profile over word n-grams — the
  * Gopher-style "fraction of n-grams inside duplicated n-grams" quality
  * signal (Rae et al. 2021, §A1.1.3's repetition filters), computed
  * per row with NO shuffle: gram hashes (token bytes hashed once, n
  * windows chained — the ShingleHashes loop WITHOUT the dedup), one
  * sort, one run-length scan. Emits exact integer counts so the check is
  * engine-portable: n_grams (all instances), n_distinct_grams, and
  * n_repeated (instances belonging to grams occurring ≥ 2 times).
  * 64-bit gram-hash collisions are the same negligible-probability
  * equivalence the Jaccard operators rely on. */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_repetition_stats needs n >= 1, got $n")

  override def prettyName: String = "graft_repetition_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false),
    StructField("n_repeated", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_stats requires array<string> tokens, got ${other.simpleString}")
  }

  def computeRow(v: ArrayData): InternalRow = {
    // null elements are dropped before windowing (tokenizers never emit
    // them, but the SQL surface can) — same as filtering them upstream
    val total = v.numElements()
    val th0 = new Array[Long](total)
    var t = 0
    var k = 0
    while (k < total) {
      val s = v.getUTF8String(k)
      if (s != null) {
        th0(t) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        t += 1
      }
      k += 1
    }
    val m = t - n + 1
    if (m <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val th = th0
    val g = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 42L
      var j = 0
      while (j < n) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
      g(i) = acc
      i += 1
    }
    java.util.Arrays.sort(g)
    var distinct = 0L
    var repeated = 0L
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && g(j) == g(i)) j += 1
      distinct += 1
      if (j - i >= 2) repeated += (j - i)
      i = j
    }
    new GenericInternalRow(Array[Any](m.toLong, distinct, repeated))
  }

  override def nullSafeEval(v: Any): Any = computeRow(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeRow($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** CHARACTER-BIGRAM ENTROPY pieces in ONE pass over the string — the
  * "does this look like language or like noise/template spam" quality
  * signal: natural text has char-bigram entropy in a narrow band; random
  * bytes sit far above it, boilerplate/repeated templates far below.
  *
  * Emits the integer pieces, not the entropy: `n_bigrams` N,
  * `n_distinct`, and `s_micros = Σ_bigram floor(c·ln(c)·1e6 + 0.5)` —
  * each count's term quantized to micro-nats BEFORE the sum (the q70
  * quantize-then-sum construction), so the total is an integer sum with
  * no float-summation order hazard and the caller finishes with
  * `H_micros = floor(ln(N)·1e6 + 0.5) − s_micros DIV N` in pure integer
  * arithmetic. `ln` carries the usual ≤1-ulp cross-engine caveat per
  * term (boundary flips are data-dependent; see q70).
  *
  * Bigrams are CODEPOINT pairs (`String.codePointAt` walk), matching SQL
  * `substring(text, i, 2)` character semantics in both engines for all
  * BMP + supplementary text; counts come from one sort of an m-long key
  * array (cp1 << 32 | cp2) — zero allocation beyond the two arrays, no
  * shuffle, no explode. Strings shorter than 2 codepoints return
  * (0, 0, 0); callers filter `n_bigrams >= 1` (≡ the oracle's
  * `length(text) >= 2`). */
case class BigramEntropyStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_bigram_entropy_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("s_micros", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_entropy_stats requires string, got ${other.simpleString}")
  }

  def computeRow(v: UTF8String): InternalRow = {
    val s = v.toString
    val len = s.length
    // codepoint walk: cps holds the document's codepoints in order
    val cps = new Array[Int](s.codePointCount(0, len))
    var i = 0
    var n = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    val m = n - 1
    if (m <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val keys = new Array[Long](m)
    i = 0
    while (i < m) {
      keys(i) = (cps(i).toLong << 32) | (cps(i + 1).toLong & 0xffffffffL)
      i += 1
    }
    java.util.Arrays.sort(keys)
    var distinct = 0L
    var sMicros = 0L
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && keys(j) == keys(i)) j += 1
      distinct += 1
      val c = (j - i).toDouble
      // identical operation order to the oracle: c * ln(c) * 1e6 + 0.5
      sMicros += math.floor(c * math.log(c) * 1e6 + 0.5).toLong
      i = j
    }
    new GenericInternalRow(Array[Any](m.toLong, distinct, sMicros))
  }

  override def nullSafeEval(v: Any): Any = computeRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bgStats", this, classOf[BigramEntropyStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.computeRow($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {
  def textStats(c: Column, profiles: Seq[Seq[String]]): Column =
    EU.column(TextStats(EU.expression(c), profiles))
  def repetitionStats(tokens: Column, n: Int): Column =
    EU.column(RepetitionStats(EU.expression(tokens), n))
  def bigramEntropyStats(text: Column): Column =
    EU.column(BigramEntropyStats(EU.expression(text)))
}

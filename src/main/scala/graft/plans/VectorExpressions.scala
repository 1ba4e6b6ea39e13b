package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The composable alternative (`aggregate(zip_with(...))`) is correct but
  * every higher-order function is CodegenFallback: per-element interpreted
  * evaluation with boxed lambda variables. Inside the ANN/near-dup
  * operators that expression is evaluated once per CANDIDATE PAIR, which
  * is the single hottest loop in the library at scale. These expressions
  * generate a tight primitive `for` loop via whole-stage codegen instead
  * (one pass computes dot and both norms), and fall back to an equally
  * tight interpreted loop off the codegen path.
  *
  * Float/double element accumulation is sequential in index order in
  * double precision — bit-identical to the fold the HOF formulation
  * produced, so oracle parity is preserved.
  *
  * Null semantics: a null array yields null (nullSafe); null ELEMENTS
  * contribute 0 (embeddings never carry null elements; documented).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${prettyName} requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getElem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected def genGet(arr: String, isFloat: Boolean, i: String): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** dot(a, b) = Σ a_i·b_i over the common prefix length. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += getElem(a, af, i) * getElem(b, bf, i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${genGet(a, elemIsFloat(left), i)} * ${genGet(b, elemIsFloat(right), i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) — dot and both norms in ONE traversal of each array.
  *
  * BIT-EQUAL to the unfused `dot(a,b) / (norm(a) * norm(b))` on EVERY
  * input, ragged arrays included: the dot runs over the common prefix
  * (as DotProduct does) while each norm accumulates its array's tail
  * too (as L2Norm does), in the same index order — which is what makes
  * [[CosineFusion]] a semantics-preserving rewrite rather than a
  * "close enough" one. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    val la = a.numElements(); val lb = b.numElements()
    val n = math.min(la, lb)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getElem(a, af, i); val y = getElem(b, bf, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    var j = n
    while (j < la) { val x = getElem(a, af, j); na += x * x; j += 1 }
    j = n
    while (j < lb) { val y = getElem(b, bf, j); nb += y * y; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val la = ctx.freshName("la"); val lb = ctx.freshName("lb")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $la = $a.numElements(); int $lb = $b.numElements();
         |int $n = java.lang.Math.min($la, $lb);
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${genGet(a, elemIsFloat(left), i)};
         |  double $y = ${genGet(b, elemIsFloat(right), i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |for (int $j = $n; $j < $la; $j++) {
         |  double $x = ${genGet(a, elemIsFloat(left), j)}; $na += $x * $x;
         |}
         |for (int $j = $n; $j < $lb; $j++) {
         |  double $y = ${genGet(b, elemIsFloat(right), j)}; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2norm(a). */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_norm"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_norm requires array<float>/array<double>, got ${other.simpleString}")
  }

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += x * x; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = $get; $s += $x * $x; }
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column + SQL surface for the native expressions. */
object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def norm(a: Column): Column =
    ExpressionUtils.column(L2Norm(ExpressionUtils.expression(a)))

  /** (name, implementing expression class, builder) — one source of truth
    * for both registration surfaces. */
  private[plans] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct].getName,
      es => DotProduct(es(0), es(1))),
    ("graft_cosine", classOf[CosineSimilarity].getName,
      es => CosineSimilarity(es(0), es(1))),
    ("graft_norm", classOf[L2Norm].getName,
      es => L2Norm(es.head)),
    ("graft_minhash", classOf[MinHashSignature].getName,
      es => MinHashSignature(es(0), es(1).eval().asInstanceOf[Number].intValue)),
    ("graft_simhash", classOf[SimHash64].getName,
      es => SimHash64(es.head)),
    ("graft_shingle_hashes", classOf[ShingleHashes].getName,
      es => ShingleHashes(es(0), es(1).eval().asInstanceOf[Number].intValue)),
    ("graft_md5_hash64", classOf[PortableHash64].getName,
      es => PortableHash64(es.head)),
    ("graft_md5_rolling_fp", classOf[PortableRollingFp].getName,
      es => PortableRollingFp(es.head)),
    ("graft_md5_shingle_hashes", classOf[PortableShingleHashes].getName,
      es => PortableShingleHashes(es(0), es(1).eval().asInstanceOf[Number].intValue)),
    ("graft_affine_minhash", classOf[AffineMinHash].getName,
      es => AffineMinHash(es(0), es(1).eval().asInstanceOf[Number].intValue)),
    ("graft_repetition_stats", classOf[RepetitionStats].getName,
      es => RepetitionStats(es(0), es(1).eval().asInstanceOf[Number].intValue)),
    ("graft_bigram_hashes", classOf[BigramHashes].getName,
      es => BigramHashes(es.head))
  )

  /** Session-scoped SQL registration: `SELECT graft_cosine(a.embedding,
    * b.embedding) FROM ...`. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

/** Extension entry point: spark.sql.extensions=graft.plans.GraftExtensions
  * (or .withExtensions(new GraftExtensions)) injects the full native
  * function surface (same builder list as [[VectorFunctions.register]])
  * plus the [[CosineFusion]] optimizer rule into every session derived
  * from the builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    VectorFunctions.builders.foreach { case (name, className, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        b))
    }
    e.injectOptimizerRule(_ => CosineFusion)
  }
}

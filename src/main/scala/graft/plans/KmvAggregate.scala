package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) DISTINCT-COUNT SKETCH aggregate (Bar-Yossef et
  * al., "Counting Distinct Elements in a Data Stream", RANDOM 2002): per
  * group, the k smallest DISTINCT values of a uniformly-hashed long
  * column, ascending. The k-th smallest of n distinct uniform draws from
  * [0, U) sits near U·k/n, so n ≈ (k−1)·U / u_k — the estimator
  * [[graft.operators.Cardinality]] applies; with fewer than k distinct
  * values the sketch IS the distinct set and the count is exact.
  *
  * Why not `countDistinct`: exact distinct is a shuffle of every distinct
  * value; this buffer is ≤ k longs per group no matter the cardinality,
  * participates in map-side partial aggregation (each partition
  * contributes at most k values to the shuffle), and two sketches merge
  * by keeping the k smallest of their union — across partitions, days,
  * or clusters. Spark's own `approx_count_distinct` (HyperLogLog++) has
  * an opaque binary buffer and a stochastic-rounding estimate; this
  * sketch is a plain sorted long array on the portable hash, so an
  * external engine replays sketch AND estimate literally (q84's oracle).
  *
  * Input must be non-null LongType (pre-hashed; null-filter upstream —
  * nulls are counted as no element by `update`).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_kmv"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a BIGINT input (pre-hashed), got ${t.sql}")
  }
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Keep the set at ≤ k smallest distinct: skip values that cannot
    * enter (≥ current max while full) without touching the tree. */
  private def add(buf: java.util.TreeSet[java.lang.Long], x: Long): Unit =
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last) { if (buf.add(x)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong())
    buf
  }
}

object KmvSketch {
  /** `kmv(u, k)`: aggregate a LongType column into its k smallest
    * distinct values, ascending (`array<long>`, size ≤ k). */
  def kmv(u: Column, k: Int): Column =
    EU.column(KmvSketch(EU.expression(u), k).toAggregateExpression())
}

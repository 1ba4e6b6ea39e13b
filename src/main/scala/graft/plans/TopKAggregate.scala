package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._

/** TOP-K BY PRIORITY as a typed imperative aggregate: keep the k best
  * (priority, id) pairs — priority DESC, id ASC tiebreak — with ≤ k
  * entries of state per group at every stage. This is the windowless
  * form of "rank per stratum, keep k": map-side partial aggregation
  * turns each partition's stream into ≤ k pairs before the shuffle, the
  * merge is a k-way best-of, and NO per-stratum sort ever happens —
  * exactly the per-partition-heap-and-merge swap
  * [[graft.operators.Sampling.weightedSample]]'s scaladoc promises for
  * global top-k at scale. Because state is bounded, the same aggregate
  * runs unchanged as a Structured Streaming complete-mode aggregation:
  * the streaming weighted reservoir (StreamingSpec).
  *
  * Output: `array<struct<priority:bigint, id:bigint>>` in kept order
  * (best first) — callers `posexplode` to recover the rank. */
case class TopKByPriority(
    priority: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_topk_by_priority"

  override def checkInputDataTypes(): TypeCheckResult =
    (priority.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (p, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (BIGINT priority, BIGINT id), got (${p.sql}, ${i.sql})")
    }

  override def children: Seq[Expression] = Seq(priority, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(priority = newChildren(0), id = newChildren(1))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("priority", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def withNewMutableAggBufferOffset(o: Int): TopKByPriority =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByPriority =
    copy(inputAggBufferOffset = o)

  /** Best-first order: higher priority, then smaller id. */
  private val ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def add(buf: java.util.TreeSet[(Long, Long)], e: (Long, Long)): Unit =
    if (buf.size < k) { buf.add(e); () }
    else if (ord.compare(e, buf.last) < 0) { if (buf.add(e)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val p = priority.eval(input)
    val i = id.eval(input)
    if (p != null && i != null) add(buf, (p.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e._1, e._2))
      i += 1
    }
    new GenericArrayData(out) // iterates best-first
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e._1); bb.putLong(e._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add((bb.getLong(), bb.getLong()))
    buf
  }
}

object TopKByPriority {
  /** `topK(priority, id, k)`: the k best (priority desc, id asc) pairs
    * as `array<struct<priority, id>>`, best first. */
  def topK(priority: Column, id: Column, k: Int): Column =
    EU.column(TopKByPriority(EU.expression(priority), EU.expression(id), k)
      .toAggregateExpression())
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row with
  * right time ≤ left time on the same key — "state at event time", the
  * lookup Spark has no native operator for (DuckDB: ASOF JOIN, which is
  * exactly what the q52 oracle uses).
  *
  * Spark-first shape: NOT a range join (a BNLJ with an inequality is
  * O(|L|·|R|) and un-broadcastable at scale). Both sides are tagged and
  * UNIONed, shuffled ONCE on the key, sorted within partitions by
  * (time, side) with right rows first at equal times (≤ semantics), and
  * the right payload — packed into ONE struct so all columns come from
  * the SAME right row — is carried forward with last(ignoreNulls) over
  * the running frame. Cost: one hash shuffle + one in-partition sort,
  * independent of how many right rows precede each left row.
  *
  * Right rows should be unique per (key, time) — pre-aggregate with a
  * deterministic winner (e.g. max_by) if not; among equal-time right
  * rows the carried one is otherwise order-dependent.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"
  ): DataFrame = {
    val reserved = Seq("__side", "__p", "__carry")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asofJoin reserves columns $reserved")
    val collisions = left.columns.toSet.intersect(payloadCols.map(prefix + _).toSet)
    require(collisions.isEmpty,
      s"asofJoin: output columns $collisions collide with left columns — change prefix")
    val leftExtra = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == timeCol)

    // null keys and null times never match (equi-join / DuckDB ASOF
    // semantics: a NULL right time is ≤ nothing). Without these filters
    // the window's ascending sort puts null-time right rows FIRST, so
    // their payload would be carried into every left row until a real
    // right row overwrote it.
    val anyKeyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val rightNN = right.filter(!anyKeyNull && col(timeCol).isNotNull)
    // null-key and null-time LEFT rows are kept (left-join semantics:
    // null payload) but routed AROUND the union/window — a null left time
    // matches no right row, and null keys hashed together would all land
    // in one window partition, a straggler task at scale, to match
    // nothing anyway
    val bypassLeft = anyKeyNull || col(timeCol).isNull
    val leftNN = left.filter(!bypassLeft)
    val leftNullKeyed = left.filter(bypassLeft)

    val rNorm = rightNN.select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__p")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lNorm = leftNN.select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(1).as("__side"),
        lit(null).cast(rNorm.schema("__p").dataType).as("__p")) ++
        leftExtra.map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc) // right (0) before left at ties -> ≤
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val outCols = keyCols.map(col) ++ Seq(col(timeCol)) ++ leftExtra.map(col)
    val joined = lNorm.unionByName(rNorm)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(outCols ++ payloadCols.map(p => col(s"__carry.$p").as(prefix + p)): _*)
    val pStruct = rNorm.schema("__p").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val bypassed = leftNullKeyed.select(outCols ++ payloadCols.map(p =>
      lit(null).cast(pStruct(p).dataType).as(prefix + p)): _*)
    joined.unionByName(bypassed)
  }
}

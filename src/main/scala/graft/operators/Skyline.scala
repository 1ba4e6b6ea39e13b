package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D PARETO FRONTIER (skyline): the rows no other row dominates, where
  * `a` dominates `b` iff a.x ≥ b.x ∧ a.y ≥ b.y with at least one strict
  * — the multi-criteria selection a curation pipeline runs when two
  * signals trade off (length vs lexical richness, quality vs coverage,
  * recency vs authority) and any single weighted score would bake in an
  * arbitrary exchange rate.
  *
  * Scale shape — the naive formulations both fail at 100 TB: the
  * NOT-EXISTS anti-join is quadratic, and a single global window over
  * the rows forces the whole table into one task. This implementation
  * reduces FIRST: groupBy(x) → max(y) collapses the input to one row
  * per distinct x (map-side combined, domain-sized — the counting-sort
  * insight again), the strictly-greater-x running max then runs over
  * that domain-sized table (a window whose input is bounded by |x
  * domain|, not by row count), and winners rejoin the corpus as a LEFT
  * SEMI on (x, y) — so ties (identical signal pairs, which never
  * dominate each other) are all kept, and no row payload enters any
  * wide stage. */
object Skyline {

  /** All rows whose (xCol, yCol) pair lies on the maximal frontier.
    * Integer-domain columns (the strictly-greater frame is value-based).
    * Returns the input columns unchanged; callers order the result. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // the strictly-greater frame below steps back ONE VALUE UNIT in x:
    // sound only on integral domains (doubles differing by <1 would be
    // silently treated as ties) — fail fast rather than return a wrong
    // frontier (r7 advisor finding)
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val xType = df.schema(xCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(xType),
      s"skyline2d needs an integral x column; $xCol is $xType " +
        "(bucket/scale continuous signals to integers first)")
    val agg = df.groupBy(xCol).agg(max(col(yCol)).as("_ymax"))
    // rows whose x is STRICTLY greater: value-range frame ending one
    // unit earlier in the descending order (integer domain)
    val strictlyGreater = Window.orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = agg
      .withColumn("_mgt", max(col("_ymax")).over(strictlyGreater))
      .filter(col("_mgt").isNull || col("_ymax") > col("_mgt"))
      .select(col(xCol), col("_ymax").as(yCol))
    df.join(frontier, Seq(xCol, yCol), "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*) // semi-join moves the keys first; restore caller order
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.VocabGrowth

class VocabGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def curve(docs: Seq[(Long, String)]) =
    VocabGrowth.heapsCurve(docs.toDF("doc_id", "text"), "doc_id",
      TextAnalysis.tokens(col("text"))).collect()

  test("hand-computed curve: first positions, octaves, cumulative vocab") {
    // running tokens: a b a | c a b -> first: a@1 b@2 c@4, N = 6
    val rows = curve(Seq((1L, "a b a"), (2L, "c a b")))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (0L, 1L, 1L, 1L, 10000L),   // a: pos 1 -> octave 0
      (1L, 2L, 1L, 2L, 10000L),   // b: pos 2 -> octave 1
      (2L, 4L, 1L, 3L, 7500L)))   // c: pos 4 -> octave 2
  }

  test("prefix is capped at the corpus size and vocab is monotone") {
    val docs = (1L to 40L).map(i => (i, s"tok$i common filler words here"))
    val rows = curve(docs)
    val n = rows.head.getLong(5)
    assert(rows.map(_.getLong(1)).forall(_ <= n))
    assert(rows.map(_.getLong(3)).sliding(2).forall(w =>
      w.length < 2 || w(0) <= w(1)))
    // total vocab = distinct tokens: 40 ids + 4 shared words
    assert(rows.last.getLong(3) == 44L)
  }

  test("pure duplication exhausts vocabulary in the earliest octaves") {
    val docs = (1L to 64L).map(i => (i, "the same boilerplate line"))
    val rows = curve(docs)
    // all 4 types are seen in the first doc; no later octave adds any
    assert(rows.last.getLong(3) == 4L)
    assert(rows.map(_.getLong(0)).max <= 2L)
  }

  test("two-phase range-partitioned prefix sum equals the global-window form") {
    // the operator's corpus offsets come from the two-phase form (local
    // running sums under a partitioned window + broadcast partition
    // offsets); this pins it to the textbook single-window definition on
    // a frame wide enough to span many range partitions, with ragged
    // token counts so partition totals differ
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 311L).map(i =>
      (i, (1L to (i % 7 + 1)).map(j => s"w${(i * 31 + j) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    val counts = docs.select(col("doc_id").as("_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("_t"))
    val naive = counts.withColumn("_o",
        sum(col("_t")).over(Window.orderBy(col("_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("_t"))
      .select("_id", "_o").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // explicit partition count: at this row count AQE would coalesce the
    // operator's advisory range shuffle to one partition (fine at scale,
    // useless for covering the cross-partition algebra here), and Spark
    // honors a user-specified number
    val local = counts.repartitionByRange(7, col("_id"))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_ls",
        sum(col("_t")).over(Window.partitionBy(col("_pid")).orderBy(col("_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true)
    val partOff = local.groupBy(col("_pid")).agg(sum(col("_t")).as("_pt"))
      .withColumn("_po",
        sum(col("_pt")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("_pt"))
      .select(col("_pid"), col("_po"))
    val twoPhase = local.join(broadcast(partOff), "_pid")
      .select(col("_id"), (col("_po") + col("_ls") - col("_t")).as("_o"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(twoPhase == naive)
    // coverage guard: the docs must have landed in several range
    // partitions (distinct _pid values — the final frame's PHYSICAL
    // partition count is 1 here because AQE coalesces the window's hash
    // exchange after the per-partition sums are already computed)
    assert(local.select(countDistinct(col("_pid"))).head.getLong(0) > 1,
      "fixture must actually span multiple range partitions")
  }

  test("doc order defines positions: reordering ids moves first occurrences") {
    val a = curve(Seq((1L, "x x x x"), (2L, "y")))
    val b = curve(Seq((1L, "y"), (2L, "x x x x")))
    // y first at pos 5 (octave 3) vs pos 1 (octave 0, with x at pos 2)
    assert(a.map(_.getLong(0)).toSet == Set(0L, 3L))
    assert(b.map(_.getLong(0)).toSet == Set(0L, 1L))
  }
}

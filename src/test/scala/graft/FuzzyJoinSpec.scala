package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def join(
      left: Seq[(Long, String)],
      right: Seq[(Long, String)],
      q: Int = 4,
      maxDist: Int = 2,
      maxGramFreq: Int = 1000) =
    FuzzyJoin.fuzzyJoin(
        left.toDF("id", "key"), right.toDF("id", "key"),
        keyCol = "key", idCol = "id",
        q = q, maxDist = maxDist, maxGramFreq = maxGramFreq)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("dist")))
      .toSet

  test("typo'd keys match within the distance bound, exact dist reported") {
    val right = Seq(
      10L -> "the quick brown fox jumps",
      11L -> "pack my box with liquor jugs",
      12L -> "sphinx of black quartz judge")
    val left = Seq(
      1L -> "the quick brown fox jumps",   // exact: dist 0
      2L -> "the quack brown fox jumps",   // one substitution: dist 1
      3L -> "pack my box with liquor jug", // one deletion: dist 1
      4L -> "completely different text")   // no match
    assert(join(left, right) == Set(
      (1L, 10L, 0), (2L, 10L, 1), (3L, 11L, 1)))
  }

  test("maxDist bounds the verify: dist-3 pair is dropped at maxDist=2") {
    val right = Seq(20L -> "abcdefghijklmnopqrstuvwx")
    val left = Seq(
      1L -> "abcdefghijklmnopqrstuvwx", // dist 0
      2L -> "abcdefghijklmnopqrs_uvwx", // dist 1
      3L -> "a_cdefg_ijklm_opqrstuvwx") // dist 3: enough shared grams, verify drops it
    assert(join(left, right, maxDist = 2) == Set((1L, 20L, 0), (2L, 20L, 1)))
    assert(join(left, right, maxDist = 3) ==
      Set((1L, 20L, 0), (2L, 20L, 1), (3L, 20L, 3)))
  }

  test("count filter prunes pairs sharing only a few grams") {
    // Shares exactly one 4-gram ("wxyz") with the right key but needs
    // max(24,24) - 3 - 8 = 13: blocked before any distance is computed,
    // and correctly so (true edit distance is far above maxDist anyway).
    val right = Seq(30L -> "aaaabbbbccccddddeeeewxyz")
    val left = Seq(1L -> "ffffgggghhhhiiiijjjjwxyz")
    assert(join(left, right).isEmpty)
  }

  test("stop-gram cap: a gram indexed on more than maxGramFreq right rows blocks nothing") {
    // Every right row carries gram "aaaa"; with the cap at 2 the gram is
    // dropped from the index, so a left key whose ONLY shared grams are
    // "aaaa" finds no candidates even at dist 0 (documented recall trade).
    val right = Seq(40L -> "aaaa", 41L -> "aaaab", 42L -> "aaaac")
    val left = Seq(1L -> "aaaa")
    assert(join(left, right, maxGramFreq = 2).isEmpty)
    assert(join(left, right, maxGramFreq = 1000).contains((1L, 40L, 0)))
  }

  test("short keys (below q) still block on the whole-string gram") {
    val right = Seq(50L -> "ab", 51L -> "cd")
    val left = Seq(1L -> "ab")
    assert(join(left, right) == Set((1L, 50L, 0)))
  }

  test("null and empty keys never match") {
    val right = Seq((60L, "hello world padding text"), (61L, ""))
    val left = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, null: String),
        org.apache.spark.sql.Row(2L, ""),
        org.apache.spark.sql.Row(3L, "hello world padding text")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType))))
    val got = FuzzyJoin.fuzzyJoin(left, right.toDF("id", "key"), "key", "id")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("dist")))
      .toSet
    assert(got == Set((3L, 60L, 0)))
  }
}

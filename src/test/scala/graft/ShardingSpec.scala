package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sharding

class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val shards8 = (0 until 8).map(i => s"S$i")
  private def keys(n: Int) = (1 to n).map(_.toLong).toDF("k")

  test("every key lands on exactly one shard and assignment is stable") {
    val a1 = Sharding.assignments(keys(500), "k", shards8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = Sharding.assignments(keys(500), "k", shards8).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1.size == 500 && a1 == a2)
    // HRW spreads: with 500 keys over 8 shards no shard is empty
    assert(a1.values.toSet.size == 8)
  }

  test("adding a shard moves keys ONLY to the new shard (HRW minimal disruption)") {
    val census = Sharding.resizeCensus(keys(2000), "k", shards8, "S8")
      .collect()
    assert(census.length == 8)
    census.foreach { r =>
      assert(r.getAs[Long]("n_lateral") == 0L,
        s"lateral migration from ${r.getString(0)}")
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_before") - r.getAs[Long]("n_to_new"))
    }
    // the new shard wins roughly |K|/9 — loosely bounded here
    val moved = census.map(_.getAs[Long]("n_to_new")).sum
    assert(moved > 2000 / 9 / 2 && moved < 2000 / 9 * 2, s"moved=$moved")
  }

  test("assignment ignores duplicate keys and shard order") {
    val dup = Seq(1L, 1L, 2L, 2L, 3L).toDF("k")
    val a = Sharding.assignments(dup, "k", shards8).collect()
    assert(a.length == 3)
    val rev = Sharding.assignments(dup, "k", shards8.reverse).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.map(r => r.getLong(0) -> r.getString(1)).toMap == rev)
  }

  test("rejects duplicate shard names") {
    intercept[IllegalArgumentException] {
      Sharding.assignments(keys(3), "k", Seq("A", "A"))
    }
  }
}

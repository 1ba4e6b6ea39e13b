package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BUCKETING — the co-located-join evidence for the 100 TB story: two
  * tables written with `bucketBy(n, key)` agree on partitioning, so an
  * equi-join on the bucket key plans WITHOUT a shuffle exchange on
  * either side. This is the lakehouse analog of the reference's
  * ClickHouse `ORDER BY` clustering (SURVEY §2 O-25): pay the
  * partitioning once at write time, reuse it on every subsequent join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed equi-join plans with zero shuffle exchanges") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_users")
      (1L to 1000L).map(i => (i % 97, i)).toDF("k", "oid")
        .write.bucketBy(8, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_bkt_orders")
      (0L to 96L).map(i => (i, s"u$i")).toDF("k", "name")
        .write.bucketBy(8, "k")
        .mode("overwrite").saveAsTable("graft_bkt_users")

      val joined = spark.table("graft_bkt_orders")
        .join(spark.table("graft_bkt_users"), "k")
      val n = joined.count() // finalizes the adaptive plan
      assert(n == 1000L) // every order key 0..96 has a user row
      val plan = joined.queryExecution.executedPlan.toString
      // both sides report their bucket layout; no Exchange anywhere
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))

      // and the result is the same as the shuffled join of the raw frames
      val raw = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "oid")
        .join((0L to 96L).map(i => (i, s"u$i")).toDF("k", "name"), "k")
      assert(joined.collect().map(_.toSeq).toSet ==
        raw.collect().map(_.toSeq).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_users")
    }
  }
}

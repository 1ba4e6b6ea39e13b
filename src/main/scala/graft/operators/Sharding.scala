package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RENDEZVOUS (highest-random-weight) SHARDING — the consistent
  * assignment primitive a serving layer puts in front of stored state
  * (the SnapshotSink family): key k goes to the shard s maximizing
  * `md5(k || "|" || s)`, so every client computes the same owner with
  * no coordination and no ring metadata, and — the property this
  * operator exists to MEASURE — adding a shard only moves the keys the
  * NEW shard now wins (expected |K|/(n+1)); no key migrates between
  * surviving shards. Hash-based mod-N sharding reshuffles ~everything
  * on resize; HRW's minimal-disruption guarantee is why it backs
  * serving-cache and shard-map designs.
  *
  * Determinism: the weight is the lexicographic order of the md5 hex
  * string (lowercase on every engine), the argmax a per-key
  * `row_number` ordered by (weight DESC, shard ASC) — a KEY-partitioned
  * window, and distinct inputs make weight ties impossible in practice
  * while the shard tiebreak keeps even that case pinned.
  *
  * Scale shape: keys × |shards| is a map-side literal explode (no
  * shuffle), the argmax one key-partitioned window (= one hash shuffle
  * on the key), the census a map-side-combined aggregate on the
  * shard-count frame. 100 TB of keys stream through at |shards|×
  * amplification with nothing data-sized ever sorted globally.
  *
  * `assignments` returns (key, shard); `resizeCensus` runs the n →
  * n+1 experiment and reports, per OLD shard, its population before
  * and after plus how many keys it surrendered (all to the new shard,
  * by the HRW property — the spec asserts no old→old migration).
  */
object Sharding {

  def assignments(df: DataFrame, keyCol: String,
                  shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      "shards must be distinct and non-empty")
    val exploded = df.select(col(keyCol).as("key")).distinct()
      .withColumn("shard", explode(array(shards.map(lit): _*)))
      .withColumn("w",
        md5(concat(col("key").cast("string"), lit("|"), col("shard"))))
    val rank = row_number().over(Window.partitionBy(col("key"))
      .orderBy(col("w").desc, col("shard").asc))
    exploded.withColumn("_rn", rank).filter(col("_rn") === 1)
      .select(col("key"), col("shard"))
  }

  def resizeCensus(df: DataFrame, keyCol: String,
                   shards: Seq[String], newShard: String): DataFrame = {
    val before = assignments(df, keyCol, shards)
      .withColumnRenamed("shard", "shard_before")
    val after = assignments(df, keyCol, shards :+ newShard)
      .withColumnRenamed("shard", "shard_after")
    before.join(after, "key") // both sides hash-partitioned on key
      .groupBy(col("shard_before").as("shard"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("shard_after") === col("shard_before"), 1L)
          .otherwise(0L)).as("n_after"),
        sum(when(col("shard_after") === lit(newShard), 1L).otherwise(0L))
          .as("n_to_new"),
        sum(when(col("shard_after") =!= col("shard_before") &&
          col("shard_after") =!= lit(newShard), 1L).otherwise(0L))
          .as("n_lateral")) // HRW invariant: always 0
  }
}

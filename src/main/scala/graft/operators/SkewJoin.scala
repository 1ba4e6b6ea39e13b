package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-resilient equi-join — the manual counterpart to AQE's
  * runtime skew-join split (`spark.sql.adaptive.skewJoin`, on by default
  * in this engine's harness).
  *
  * A heavy-hitter key sends all its rows to ONE shuffle partition; with a
  * salt in [0, salts) appended to the skewed side's key and the other
  * side replicated salts×, the hot key's rows spread over `salts`
  * partitions. Result is EXACTLY the plain join: each skewed row carries
  * one salt value and matches exactly the one replica with that salt.
  *
  * Use when AQE is unavailable or when the skew is known ahead of plan
  * time and deterministic layout matters (AQE's split happens at runtime
  * per stage). Supported join types are the skewed-side-preserving ones —
  * inner, left_outer, left_semi, left_anti — where replication provably
  * cannot duplicate or drop rows; others throw.
  */
object SkewJoin {

  private val Supported = Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  /** @param skewed the LARGE side with hot keys (row-preserved)
    * @param other  the side that is too big to broadcast but small enough
    *               to replicate `salts` times through the shuffle
    * @param keys   equi-join column names (present on both sides)
    * @param salts  spread factor for a hot key (≈ number of partitions a
    *               heavy hitter should occupy) */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Supported(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports skewed-side-preserving joins only, got $joinType")
    require(!skewed.columns.contains("__salt") && !other.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it on the inputs")
    // deterministic within a run; any per-row spread works — the salt only
    // balances partitions, it never affects the join result
    val s = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    s.join(o, keys :+ "__salt", joinType).drop("__salt")
  }
}

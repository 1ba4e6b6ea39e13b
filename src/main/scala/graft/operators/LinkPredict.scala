package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RESOURCE-ALLOCATION LINK PREDICTION over a bipartite membership frame
  * (basket, item) — "which item pairs does the co-occurrence structure
  * predict an edge between". The RA index (Zhou/Lü/Zhang 2009) scores a
  * candidate pair by Σ over shared baskets of 1/|basket|: a pair meeting
  * in three 2-item baskets outranks one meeting in three 100-item
  * baskets, which is what separates signal from hub noise and what raw
  * common-neighbor counts (and q110's support counts) cannot express.
  *
  * Integer-exact: each basket contributes `1000000 DIV |basket|` micros
  * (truncated PER TERM, the house DIV convention), so the score is a sum
  * of integers — bit-identical on any engine, no float accumulation
  * order to replay.
  *
  * Scale shape: the membership frame shuffles ONCE on basket (the
  * self-join reuses the same exchange on both sides); candidate pairs
  * are generated per basket — Σ C(|basket|,2) rows, bounded by the
  * `maxBasket` contract below — then one map-side-combined aggregate on
  * the pair key. No all-pairs step anywhere: items never meeting in a
  * basket are never materialized.
  *
  * Contract: baskets larger than `maxBasket` are EXCLUDED, not sampled —
  * the standard LP practice, for two reasons that agree: a hub basket's
  * per-pair weight (≤ 10⁶/size micros) is negligible, and its pair
  * fan-out is quadratic. The cut is part of the operator's definition
  * (the oracle replays it), so results stay deterministic rather than
  * depending on a sampling seed.
  *
  * Output: one row per co-occurring pair (item_a < item_b) —
  * `common_baskets` (raw co-occurrence), `ra_micros` (the RA score).
  */
object LinkPredict {

  def resourceAllocation(
      membership: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 256): DataFrame = {
    require(maxBasket >= 2, "maxBasket must be at least 2")
    val m = membership
      .select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val deg = m.groupBy("__bk").agg(count(lit(1)).as("__bsize"))
    // weight rides the left copy only — summing it once per pair
    val bounded = m.join(deg.filter(col("__bsize") <= maxBasket), "__bk")
      .withColumn("__w",
        expr("CAST(1000000 DIV __bsize AS BIGINT)"))
      .localCheckpoint(true) // consumed twice: both sides of the self-join
    val a = bounded.select(col("__bk"), col("__it").as("item_a"), col("__w"))
    val b = bounded.select(col("__bk"), col("__it").as("item_b"))
    a.join(b, Seq("__bk"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("common_baskets"),
        sum(col("__w")).as("ra_micros"))
  }
}

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
  * Scale shape: TWO shuffles total. The membership frame aggregates
  * once into per-basket sorted distinct-item arrays (map-side combined;
  * the size cut applies to the array, so hub baskets die before
  * emitting a single pair); candidate pairs are then generated
  * MAP-SIDE from each array — Σ C(|basket|,2) rows, bounded by the
  * `maxBasket` contract below, no self-join and no second pass over
  * membership — and one map-side-combined aggregate on the pair key
  * finishes. Items never meeting in a basket are never materialized,
  * and the sorted array makes item_a < item_b canonical for free.
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
    membership
      .select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .groupBy("__bk")
      .agg(sort_array(collect_set(col("__it"))).as("__items"))
      .filter(size(col("__items")).between(2, maxBasket))
      .select(explode(expr(
        // all i<j pairs off the sorted array, map-side: the struct
        // carries (item_a, item_b, weight) per co-occurrence
        """flatten(transform(__items, (a, i) ->
          |  transform(slice(__items, i + 2, size(__items) - i - 1),
          |    b -> struct(a AS item_a, b AS item_b,
          |      CAST(1000000 DIV size(__items) AS BIGINT) AS w))))"""
          .stripMargin.replace("\n", " "))).as("p"))
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).as("common_baskets"),
        sum(col("p.w")).as("ra_micros"))
  }
}

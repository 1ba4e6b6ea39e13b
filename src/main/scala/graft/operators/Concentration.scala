package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WEIGHT-CONCENTRATION CENSUS — how unequally a corpus's mass is
  * spread over a DOMAIN-BOUNDED key set (sources, languages, shards):
  * the Gini coefficient plus the top-1/top-5 holder shares, the
  * instrument behind "is this mixture one crawl wearing twenty
  * source labels". Balanced mixes read gini ≈ 0; a single dominant
  * holder reads → 10⁴·(n−1)/n.
  *
  * Gini over the per-key totals x_1..x_n via the mean-absolute-
  * difference identity — G = Σ_i Σ_j |x_i − x_j| / (2·n·Σx) — computed
  * on the KEY-TOTAL frame's self-join (the tauB cell-pair discipline:
  * O(n²) over the key DOMAIN, never over rows; each unordered pair
  * once, |x_i − x_j| doubled to keep the classic denominator). The
  * operator REQUIRES the key domain to be bounded (`maxKeys`,
  * default 4096, enforced with a loud error): concentration over an
  * unbounded key set (users, fingerprints) is a different question —
  * bucket it first (q279's Zipf octaves are that instrument).
  *
  * Integer-exact: the pair-difference sum runs in DECIMAL(38,0)
  * (n ≤ 4096 keys of ≤10¹⁸ tokens → Σ|diff| ≤ 10²⁵), readouts are
  * truncating permyriad BIGINT. Top-k shares come from the sorted
  * key-total frame's first k rows — domain-bounded, no global window.
  *
  * Output: ONE row per labeled census — label, n_keys, total_w,
  * max_w, gini_pm, top1_pm, top5_pm.
  */
object Concentration {

  def gini(df: DataFrame, keyCol: String, weightCol: String,
           label: String, maxKeys: Int = 4096): DataFrame = {
    val totals = df
      .groupBy(col(keyCol).as("_k"))
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("_w"))
      .localCheckpoint(true) // census + pair join + top-k
    val n = totals.count()
    require(n > 0, s"gini($label): empty key set")
    require(n <= maxKeys,
      s"gini($label): $n keys exceeds the $maxKeys-key domain contract — " +
        "bucket the keys first (Zipf octaves / quantiles)")
    val l = totals.select(col("_k").as("_k1"), col("_w").as("_w1"))
    val r = totals.select(col("_k").as("_k2"), col("_w").as("_w2"))
    val pairSum = l.join(r, col("_k1") < col("_k2"))
      .agg(coalesce(sum(expr(
        "2 * abs(CAST(_w1 AS DECIMAL(38,0)) - _w2)")),
        lit(0).cast("decimal(38,0)")).as("_ad"))
    val top = totals.orderBy(col("_w").desc, col("_k")).limit(5)
      .agg(max(col("_w")).as("_max"), sum(col("_w")).as("_top5"))
    totals.agg(count(lit(1)).as("n_keys"), sum(col("_w")).as("total_w"))
      .crossJoin(pairSum).crossJoin(top)
      .select(lit(label).as("census"), col("n_keys"), col("total_w"),
        col("_max").as("max_w"),
        expr("CAST(10000 * _ad DIV nullif(2 * CAST(n_keys AS DECIMAL(38,0))" +
          " * total_w, 0) AS BIGINT)").as("gini_pm"),
        expr("CAST(10000 * _max DIV nullif(total_w, 0) AS BIGINT)")
          .as("top1_pm"),
        expr("CAST(10000 * _top5 DIV nullif(total_w, 0) AS BIGINT)")
          .as("top5_pm"))
  }
}

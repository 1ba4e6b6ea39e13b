package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OFF-POLICY EVALUATION over a logged interaction stream: estimate what
  * a TARGET policy π would have earned from logs collected under a
  * different behavior policy, without an online test. Inverse propensity
  * scoring (Horvitz–Thompson) reweights each logged (context, action,
  * reward) by 1[π(x)=a]/p(a|x); the self-normalized variant (SNIPS,
  * Swaminathan & Joachims '15) divides by Σ weights instead of n,
  * trading a little bias for much lower variance. The effective sample
  * size (Owen) says how many logged events actually back the estimate —
  * the honesty metric every OPE readout should ship with.
  *
  * Exactness: propensities come from a closed set {1/4, 3/4}, so every
  * weight is the rational k/3 with k ∈ {12, 4} — rewards (DECIMAL(12,2))
  * times integer k accumulate exactly in any order, and every reported
  * ratio is a truncating integer division:
  *     ips_milli   = 10·numΣ DIV (3n)      (numΣ = Σ matched r·k·100)
  *     snips_milli = 10·numΣ DIV Σk         (the /3 cancels)
  *     ess_pm      = 10⁴·(Σk)² DIV (n·Σk²)  (scale factors cancel)
  *
  * Scale shape: ONE scan, one aggregate keyed on the target action (a
  * handful of groups) — propensity, match and weight are all scan-side
  * projections; no joins, no windows, no driver state. */
object OffPolicy {

  /** @param logs      logged interactions
    * @param userCol   context key (the unit the target policy decides on)
    * @param actionCol logged action
    * @param rewardCol observed reward (cast to DECIMAL(12,2))
    * @param actions   the closed action vocabulary (target policy picks
    *                  from these; logged actions outside it never match)
    * @param propSalt  salt of the behavior policy's propensity hash:
    *                  p(a|x) = 1/4 or 3/4 by md5 bucket of "user:action"
    * @param targetSalt salt of the deterministic target policy
    *                  π(x) = actions[bucket(user) mod |actions|]
    * @return one row per target action: n (events whose context maps to
    *         it), n_matched, sum_k, ips_milli, snips_milli, ess_pm */
  def ipsReadout(
      logs: DataFrame,
      userCol: String,
      actionCol: String,
      rewardCol: String,
      actions: Seq[String],
      propSalt: String = "prop",
      targetSalt: String = "tgt"
  ): DataFrame = {
    require(actions.nonEmpty, "need a closed action vocabulary")
    val target = element_at(
      array(actions.map(lit): _*),
      (Sampling.bucket(col(userCol), targetSalt) % actions.size).cast("int") + 1)
    val pLow = Sampling.bucket(
      concat(col(userCol).cast("string"), lit(":"), col(actionCol)), propSalt) < 5000
    val k = when(pLow, lit(12L)).otherwise(lit(4L)) // 3/p, exact
    val matched = col(actionCol) === col("_target")
    val num = (col(rewardCol).cast("decimal(12,2)") * k * 100)
      .cast("decimal(38,0)") // integral by construction: scale-2 × 100
    logs
      .withColumn("_target", target)
      .groupBy(col("_target").as("target_action"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(matched, 1L).otherwise(0L)).as("n_matched"),
        sum(when(matched, k).otherwise(0L)).as("sum_k"),
        sum(when(matched, k * k).otherwise(0L)).as("_sum_k2"),
        sum(when(matched, num).otherwise(lit(0L).cast("decimal(38,0)")))
          .as("_num"))
      .select(col("target_action"), col("n"), col("n_matched"), col("sum_k"),
        expr("_num * 10 DIV (3 * n)").as("ips_milli"),
        when(col("sum_k") > 0, expr("_num * 10 DIV sum_k")).otherwise(0L)
          .as("snips_milli"),
        when(col("_sum_k2") > 0,
          expr("CAST(sum_k AS DECIMAL(38,0)) * sum_k * 10000 DIV (n * _sum_k2)"))
          .otherwise(0L).as("ess_pm"))
      .orderBy(col("target_action"))
  }
}

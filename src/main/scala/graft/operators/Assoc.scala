package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ASSOCIATION-RULE MINING over transactions — support / confidence /
  * lift for every ordered item pair (a → b), all in integer per-myriad so
  * the report is engine-exact and diffable.
  *
  *   support_pm(a→b)    = n_ab · 10⁴ DIV N
  *   confidence_pm(a→b) = n_ab · 10⁴ DIV n_a
  *   lift_pm(a→b)       = n_ab · N · 10⁴ DIV (n_a · n_b)   (10⁴ = independence)
  *
  * The lift numerator multiplies three counts, so it runs in
  * DECIMAL(38,0) with Spark's integral `DIV` — exact at any realistic N
  * (the 38-digit envelope holds past 10¹⁰ transactions), and ANSI throws
  * loudly rather than wrap beyond it.
  *
  * Scale shape: one distinct-shuffle to (txn, item); a per-txn item-count
  * semi-join drops transactions above `maxItemsPerTxn` (the standard
  * basket hygiene — a degenerate mega-basket contributes k² pairs and
  * zero insight; the cap bounds the self-join's quadratic term); the
  * pair self-join shuffles on the txn key and its output is Σ k(k−1) over
  * retained baskets. Item marginals are vocabulary-sized (broadcast);
  * the transaction total rides a 1-row cross join.
  */
object Assoc {

  /** `(antecedent, consequent, n_ab, n_a, n_b, n_txn, support_pm,
    * confidence_pm, lift_pm)` for ordered pairs with
    * `n_ab >= minPairCount`, ordered by (antecedent, consequent).
    *
    * @param txns     transaction-item rows (duplicates fine — de-duped)
    * @param txnCols  columns jointly identifying a transaction
    * @param itemCol  the item column
    * @param minPairCount drop pairs co-occurring fewer times (support floor)
    * @param maxItemsPerTxn transactions with more DISTINCT items than
    *        this are excluded entirely (from marginals and the total too,
    *        keeping every ratio consistent against one retained universe)
    */
  def rules(
      txns: DataFrame,
      txnCols: Seq[String],
      itemCol: String,
      minPairCount: Long = 1L,
      maxItemsPerTxn: Int = 1000
  ): DataFrame = {
    require(txnCols.nonEmpty, "need at least one transaction key column")
    require(minPairCount >= 1L, "minPairCount must be >= 1")
    require(maxItemsPerTxn >= 2, "maxItemsPerTxn must be >= 2 (pairs need 2)")
    val keys = txnCols.map(col)
    // (txn, item) is consumed four times (cap filter, total, marginals,
    // and BOTH sides of the pair join); localCheckpoint materializes the
    // distinct basket rows once so the upstream transaction scan (which
    // may carry a session-window chain) never re-executes per consumer.
    val items = txns.select((keys :+ col(itemCol).as("item")): _*).distinct()
      .localCheckpoint(true)
    val kept = items.groupBy(keys: _*).agg(count(lit(1)).as("_k"))
      .filter(col("_k") <= maxItemsPerTxn)
      .select(keys: _*)
    val retained = items.join(kept, txnCols).localCheckpoint(true)

    val total = retained.select(keys: _*).distinct()
      .agg(count(lit(1)).as("n_txn"))
    val marginals = retained.groupBy(col("item")).agg(count(lit(1)).as("n_i"))

    val a = retained.select((keys :+ col("item").as("antecedent")): _*)
    val b = retained.select((keys :+ col("item").as("consequent")): _*)
    val pairs = a.join(b, txnCols)
      .filter(col("antecedent") =!= col("consequent"))
      .groupBy("antecedent", "consequent")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)

    pairs
      .join(marginals.select(col("item").as("antecedent"), col("n_i").as("n_a")),
        "antecedent")
      .join(marginals.select(col("item").as("consequent"), col("n_i").as("n_b")),
        "consequent")
      .crossJoin(total)
      .select(col("antecedent"), col("consequent"),
        col("n_ab"), col("n_a"), col("n_b"), col("n_txn"),
        expr("n_ab * 10000 DIV n_txn").as("support_pm"),
        expr("n_ab * 10000 DIV n_a").as("confidence_pm"),
        expr("""CAST(n_ab AS DECIMAL(38,0)) * n_txn * 10000
                DIV (CAST(n_a AS DECIMAL(38,0)) * n_b)""")
          .cast("long").as("lift_pm"))
      .orderBy("antecedent", "consequent")
  }
}

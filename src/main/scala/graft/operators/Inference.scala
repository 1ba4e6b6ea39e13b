package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CATEGORICAL + RANK INFERENCE — independence, agreement and rank-sum
  * tests whose statistics are INTEGER-EXACT: every ratio is
  * cross-multiplied into DECIMAL(38,0) products and divided once with
  * truncating `DIV` (DuckDB `//` agrees on negatives), so a verdict or a
  * scaled statistic is bit-identical on any engine and any aggregation
  * order — the [[Experiment]] z-test discipline extended to χ², Cohen's
  * κ and Mann–Whitney U.
  *
  * Scale shape shared by the family: ONE count-shuffle over the grouping
  * keys collapses the input to a domain-sized frame (cells of a
  * contingency table, distinct metric values); everything after runs on
  * that frame. Exactness envelopes are documented per test; breach
  * throws under ANSI decimal — never a silent wrong verdict.
  */
object Inference {

  private def big(c: Column): Column = c.cast("decimal(38,0)")

  /** Pearson χ² independence audit over two categorical columns, with
    * the full zero-filled R × C grid (absent cells contribute
    * e_ij = r_i·c_j/N to the statistic — dropping them understates χ²).
    *
    * Per-cell contribution, integer-quantized to parts-per-billion:
    *
    *     term_ppb = 10⁹·(N·o − r·c)²  DIV  (N·r·c)
    *
    * χ²_ppb is the plain integer SUM of cell terms (order-free);
    * Cramér's V² in ppm follows as χ²_ppb DIV (10³·N·min(R−1, C−1)).
    * Quantize-then-sum is the defined semantics — the truncation error
    * is < RC/10⁹ in χ² units, and both engines replay it identically.
    *
    * Exactness envelope: 10⁹·(N·o)² must fit 38 digits — holds through
    * N ≈ 3·10⁹ input rows; beyond that ANSI overflow throws loudly.
    *
    * @return one row per grid cell (a, b, o, row_total, col_total,
    *         term_ppb) with the table-level χ²_ppb / dof / v2_ppm
    *         repeated via a 1-row scalar cross-join
    */
  def chiSquareAudit(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("cc"))
      .localCheckpoint(true) // read 4× below; the count-shuffle runs once
    val rows = cells.groupBy(col(aCol)).agg(sum(col("cc")).cast("long").as("row_total"))
    val colsT = cells.groupBy(col(bCol)).agg(sum(col("cc")).cast("long").as("col_total"))
    val grid = rows.crossJoin(colsT)
      .join(cells, Seq(aCol, bCol), "left")
      .na.fill(0L, Seq("cc"))
      .withColumn("o", col("cc").cast("long")).drop("cc")
    val tot = cells.agg(sum(col("cc")).cast("long").as("nn"),
      countDistinct(col(aCol)).as("r_cats"), countDistinct(col(bCol)).as("c_cats"))
    val terms = grid.crossJoin(tot)
      .withColumn("term_ppb", expr(
        """(1000000000 * (CAST(nn AS DECIMAL(38,0)) * o - CAST(row_total AS DECIMAL(38,0)) * col_total)
          |             * (CAST(nn AS DECIMAL(38,0)) * o - CAST(row_total AS DECIMAL(38,0)) * col_total))
          |DIV (CAST(nn AS DECIMAL(38,0)) * row_total * col_total)""".stripMargin))
    val summary = terms.agg(
        sum(col("term_ppb")).cast("long").as("chi2_ppb"),
        max(col("nn")).as("nn2"),
        ((max(col("r_cats")) - 1) * (max(col("c_cats")) - 1)).as("dof"),
        least(max(col("r_cats")), max(col("c_cats"))).as("mrc"))
      .withColumn("v2_ppm", expr(
        "CASE WHEN mrc > 1 THEN chi2_ppb DIV (1000 * nn2 * (mrc - 1)) END"))
      .select(col("chi2_ppb"), col("dof"), col("v2_ppm"))
    terms.select(col(aCol), col(bCol), col("o"), col("row_total"),
        col("col_total"), col("term_ppb"))
      .crossJoin(summary)
      .orderBy(aCol, bCol)
  }

  /** Mutual information between two categorical columns — the
    * information-theoretic completion of [[chiSquareAudit]] (χ² asks "is
    * there dependence"; MI asks "how many nats does knowing B buy about
    * A").
    *
    * Each observed cell's pointwise mutual information is quantized to
    * integer micro-nats FIRST (the q70 quantize-then-sum construction —
    * `floor(ln((N·o)/(r·c))·10⁶ + 0.5)`, both engines evaluating the
    * same double ratio), then the exact integer finish:
    *
    *     mi_micronats  = Σ_cells o·pmi_micronats  DIV  N
    *     h_a_micronats = Σ_rows  r·ln(N/r)-terms  DIV  N   (ditto h_b)
    *     u_a_ppm       = 10⁶·mi DIV h_a   (uncertainty coefficient:
    *                     the share of A's entropy explained by B)
    *
    * Zero cells contribute nothing to MI (lim p→0 of p·ln = 0), so only
    * OBSERVED cells materialize — no grid fill, the frame is bounded by
    * support size.
    *
    * @return one row per observed cell (a, b, o, pmi_micronats) with
    *         the table-level mi/h_a/h_b/u_a_ppm/u_b_ppm repeated via a
    *         1-row scalar cross-join
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rows = cells.groupBy(col(aCol)).agg(sum(col("o")).cast("long").as("r"))
    val colsT = cells.groupBy(col(bCol)).agg(sum(col("o")).cast("long").as("c"))
    val tot = cells.agg(sum(col("o")).cast("long").as("nn"))
    val terms = cells.join(rows, aCol).join(colsT, bCol).crossJoin(tot)
      .withColumn("pmi_micronats", expr(
        """CAST(floor(ln((CAST(nn AS DOUBLE) * o) / (CAST(r AS DOUBLE) * c))
          |  * 1e6 + 0.5) AS BIGINT)""".stripMargin))
      .localCheckpoint(true)
    val hOf = (mass: DataFrame, m: String) => mass.crossJoin(tot)
      .select(sum(col(m) * expr(
        s"CAST(floor(ln(CAST(nn AS DOUBLE) / $m) * 1e6 + 0.5) AS BIGINT)"))
        .as("hsum"), max(col("nn")).as("n0"))
      .select(expr("hsum DIV n0").as("h"))
    val summary = terms
      .agg(sum(col("o") * col("pmi_micronats")).as("misum"), max(col("nn")).as("n0"))
      .select(expr("misum DIV n0").cast("long").as("mi_micronats"))
      .crossJoin(hOf(rows, "r").select(col("h").cast("long").as("h_a_micronats")))
      .crossJoin(hOf(colsT, "c").select(col("h").cast("long").as("h_b_micronats")))
      .withColumn("u_a_ppm", expr(
        "CASE WHEN h_a_micronats > 0 THEN (1000000 * mi_micronats) DIV h_a_micronats END"))
      .withColumn("u_b_ppm", expr(
        "CASE WHEN h_b_micronats > 0 THEN (1000000 * mi_micronats) DIV h_b_micronats END"))
    terms.select(col(aCol), col(bCol), col("o").cast("long").as("o"),
        col("pmi_micronats"))
      .crossJoin(summary)
      .orderBy(aCol, bCol)
  }

  /** Cohen's κ inter-rater agreement between two label columns sharing a
    * domain. With diagonal mass D = Σ n_ii and chance mass
    * E = Σ r_i·c_i (row × column totals joined on the SAME label):
    *
    *     po_ppm    = 10⁶·D DIV N
    *     pe_ppm    = 10⁶·E DIV N²
    *     kappa_ppm = 10⁶·(N·D − E) DIV (N² − E)
    *
    * — the exact (po − pe)/(1 − pe) cross-multiplied, negative κ
    * (below-chance agreement) dividing toward zero identically on both
    * engines. Degenerate N² = E (a single cell) reports NULL κ.
    *
    * @return one row per confusion cell (a, b, o) with n / po_ppm /
    *         pe_ppm / kappa_ppm repeated via a 1-row scalar cross-join
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rows = cells.groupBy(col(aCol)).agg(sum(col("o")).cast("long").as("r"))
    val colsT = cells.groupBy(col(bCol)).agg(sum(col("o")).cast("long").as("c"))
    val e = rows.join(colsT, col(aCol) === col(bCol))
      .agg(sum(big(col("r")) * big(col("c"))).as("e"))
    val scal = cells.agg(
        sum(col("o")).cast("long").as("n"),
        sum(when(col(aCol) === col(bCol), col("o")).otherwise(0L))
          .cast("long").as("d"))
      .crossJoin(e)
      .withColumn("po_ppm", expr("(1000000 * CAST(d AS DECIMAL(38,0))) DIV n"))
      .withColumn("pe_ppm", expr(
        "(1000000 * e) DIV (CAST(n AS DECIMAL(38,0)) * n)"))
      .withColumn("kappa_ppm", expr(
        """CASE WHEN CAST(n AS DECIMAL(38,0)) * n - e <> 0
          |THEN (1000000 * (CAST(n AS DECIMAL(38,0)) * d - e))
          |     DIV (CAST(n AS DECIMAL(38,0)) * n - e) END""".stripMargin))
      .select(col("n"), col("po_ppm"), col("pe_ppm"), col("kappa_ppm"))
    cells.select(col(aCol), col(bCol), col("o").cast("long").as("o"))
      .crossJoin(scal)
      .orderBy(aCol, bCol)
  }

  /** Mann–Whitney U rank-sum test between two groups, integer-exact
    * including midrank tie handling and the tie-corrected normal
    * approximation.
    *
    * Ranks never materialize per row: the input collapses to the
    * DISTINCT-VALUE frame (v, c_v, a_v) and midranks ride the cumulative
    * count — an item tied at value v has 2·midrank = 2·C_v + c_v + 1
    * (C_v = items strictly below v), so twice group A's rank sum is
    *
    *     2R_A = Σ_v a_v·(2·C_v + c_v + 1),   U2 = 2·U_A = 2R_A − n_a·(n_a+1)
    *
    * The 95% two-sided verdict cross-multiplies z² > 3.8416 with the
    * tie-corrected variance σ² = n_a·n_b·[N(N²−1) − Σ(c³−c)] / (12·N(N−1)):
    *
    *     10⁴·3·N·(N−1)·(U2 − n_a·n_b)²  >  38416·n_a·n_b·(N(N²−1) − Σ(c³−c))
    *
    * Rank-biserial effect r_ppm = 10⁶·(U2 − n_a·n_b) DIV (n_a·n_b).
    * Envelope: 38416·n_a·n_b·N³ fits 38 digits through N ≈ 10⁶ units.
    *
    * The ranking window runs over the distinct-value DOMAIN frame
    * (unpartitioned by design — it is the whole ordered domain, bounded
    * by value cardinality, not by input rows).
    *
    * @param df       one row per unit
    * @param valueCol integral per-unit metric
    * @param groupCol 0 (group A) / 1 (group B)
    * @return 1 row: n_a, n_b, u2_a, tie_term, r_ppm, significant
    */
  def mannWhitney(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val vals = df.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("c"),
        sum(when(col(groupCol) === 0, 1L).otherwise(0L)).as("ca"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = vals.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
    cum.agg(
        sum(col("ca")).as("n_a"),
        sum(col("c")).as("nn"),
        sum(big(col("ca")) * (lit(2) * col("cb") + col("c") + 1)).as("ra2"),
        sum(big(col("c")) * col("c") * col("c") - col("c")).as("tie_big"))
      .withColumn("n_b", col("nn") - col("n_a"))
      .withColumn("u2_a", expr(
        "CAST(ra2 - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS BIGINT)"))
      .withColumn("tie_term", col("tie_big").cast("long"))
      .withColumn("r_ppm", expr(
        """CASE WHEN n_a > 0 AND n_b > 0
          |THEN (1000000 * (CAST(u2_a AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b))
          |     DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) END""".stripMargin))
      .withColumn("significant", expr(
        """30000 * CAST(nn AS DECIMAL(38,0)) * (nn - 1)
          |  * (CAST(u2_a AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)
          |  * (CAST(u2_a AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)
          |> 38416 * CAST(n_a AS DECIMAL(38,0)) * n_b
          |  * (CAST(nn AS DECIMAL(38,0)) * (CAST(nn AS DECIMAL(38,0)) * nn - 1) - tie_term)""".stripMargin))
      .select(col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        col("u2_a"), col("tie_term"), col("r_ppm"), col("significant"))
  }
}

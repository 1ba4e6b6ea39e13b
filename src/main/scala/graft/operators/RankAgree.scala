package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANKING-AGREEMENT INSTRUMENTS — how much two rankings of the same
  * items agree, the readout behind "did the new scorer change the
  * top-k" (q234 measures turnover of ONE ranking over time; these
  * compare TWO rankings at the same instant).
  *
  * Both are integer-exact under the house truncating-DIV convention so
  * the gate can hash them, and both collapse to bounded frames before
  * any pairwise step — no O(n²) over raw rows anywhere.
  */
object RankAgree {

  /** RANK-BIASED OVERLAP truncated at depth k (Webber/Moffat/Zobel
    * 2010): RBO = Σ_{d=1..k} (1−p)·p^(d−1)·|A[:d] ∩ B[:d]|/d, the
    * top-weighted agreement measure for INDEFINITE rankings — depth d
    * contributes at geometric weight, so swapping ranks 1-2 moves the
    * score far more than swapping 19-20 (which plain set-overlap@k
    * cannot see). `residual_ppm` = 10⁶·p^k is the mass the truncation
    * leaves unassigned — the honest error bar of comparing only k deep.
    *
    * Arithmetic: p = pNum/pDen rational; depth d's term is
    * 10⁶·pNum^(d−1)·(pDen−pNum)·X_d DIV (pDen^d · d), truncated PER
    * DEPTH in DECIMAL(38,0) (pDen^k·k ≤ 10²⁰·32 — 128-bit headroom
    * mandatory, int64 overflows at d=19).
    *
    * Scale shape: the two rank frames join once on (key, item) — only
    * SHARED items survive, ≤ k per key; X_d = |{shared: max(rankA,
    * rankB) ≤ d}| materializes as a (key × depth) frame of ≤ k rows per
    * key via a broadcast depth spine. Everything after the join is
    * k-bounded per key.
    *
    * Inputs: per key, each side's items with ranks 1..k (ranks beyond
    * k are ignored). Output per key: `overlap_at_k`, `rbo_ppm`,
    * `residual_ppm`. Keys present in only one side are dropped (no
    * ranking to compare). */
  def rbo(a: DataFrame, b: DataFrame, keyCol: String, itemCol: String,
          rankCol: String, k: Int, pNum: Long = 9L, pDen: Long = 10L): DataFrame = {
    require(k >= 1 && k <= 32, "k in [1,32]")
    require(pNum > 0 && pNum < pDen, "p in (0,1)")
    val cap = BigInt(10).pow(38) - 1
    require(BigInt(1000000) * BigInt(pNum).pow(k - 1) * (pDen - pNum) * k <= cap
        && BigInt(pDen).pow(k) * k <= cap,
      "p/k combination overflows DECIMAL(38,0)")
    def side(df: DataFrame, r: String) = df
      .filter(col(rankCol) <= k)
      .select(col(keyCol).as("key"), col(itemCol).as("item"),
        col(rankCol).cast("long").as(r))
    val shared = side(a, "ra").join(side(b, "rb"), Seq("key", "item"))
      .select(col("key"), greatest(col("ra"), col("rb")).as("dmin"))
    // the geometric weights are EXACT BigInt power literals riding the
    // depth spine — pow() is a double and 9^19 already exceeds 2^53, so
    // a float power would silently corrupt the deep terms on one engine
    // and not the other
    val spine = (1 to k).map { d =>
      (d.toLong, BigInt(pNum).pow(d - 1).toString,
        BigInt(pDen).pow(d).toString)
    }
    import a.sparkSession.implicits._
    val depths = spine.toDF("d", "pn", "pd")
      .select(col("d"), col("pn").cast("decimal(38,0)").as("pn"),
        col("pd").cast("decimal(38,0)").as("pd"))
    val residual =
      (BigInt(1000000) * BigInt(pNum).pow(k) / BigInt(pDen).pow(k)).toLong
    // one row per (key, depth): X_d, then the per-depth truncated term
    shared.join(broadcast(depths), col("dmin") <= col("d"))
      .groupBy("key", "d")
      .agg(count(lit(1)).as("xd"), max(col("pn")).as("pn"),
        max(col("pd")).as("pd"))
      .withColumn("term_ppm", expr(
        s"CAST(1000000 * pn * ${pDen - pNum} * xd DIV (pd * d) AS BIGINT)"))
      .groupBy("key")
      .agg(max(when(col("d") === k, col("xd"))).as("overlap_at_k"),
        sum(col("term_ppm")).as("rbo_ppm"))
      .withColumn("residual_ppm", lit(residual))
      .withColumnRenamed("key", keyCol)
  }

  /** KENDALL τ-b over a QUANTIZED contingency grid — monotone
    * association between two metrics, with the tie correction that τ-a
    * lacks. The textbook algorithm enumerates C(n,2) row pairs —
    * quadratic, a named scale-killer — so this operator computes the
    * identical quantity from the (xcell, ycell, count) CONTINGENCY
    * table instead: concordant/discordant/tied pair counts are
    * cell-pair sums and within-cell combinatorics (the q277
    * group-size-combinatorics discipline), making the pairwise step
    * O(grid²) per key with the grid bounded by the DOMAIN of the
    * quantized metrics, not the row count. Quantization (caller
    * supplies pre-bucketed cells) is part of the operator's contract —
    * τ is then exact over the quantized values, the same trade q266
    * pins for monetary quintiles.
    *
    * τ-b = (C−D)/√((n0−Tx)(n0−Ty)); the square root is not integer-
    * expressible, so the gated readout is the SIGNED SQUARE in
    * truncating permyriad: τ²_pm = sign(C−D)·10⁴·(C−D)² DIV
    * ((n0−Tx)(n0−Ty)), computed in DECIMAL(38,0) (pair counts square
    * to ~10²⁴ at 10¹² rows), NULL when either margin is fully tied
    * (denominator 0).
    *
    * Output per key: n, concordant, discordant, ties_x, ties_y (each
    * INCLUDING both-tied pairs, per the τ-b margins), ties_both, and
    * tau2_pm. The pair counters are emitted as BIGINT — the 128-bit
    * width stays internal to the τ² arithmetic, because a decimal
    * readout hashes differently across engines (pandas renders Spark's
    * decimal128 as `Decimal` objects, DuckDB's as float64 — equal
    * values, different typed hashes). Exact while any single key holds
    * < ~4.3×10⁹ rows (C(n,2) < 2⁶³); keys are grading cells (brands,
    * languages), so that bound holds far past 100 TB of raw rows — and
    * the narrowing is guarded (raise_error past Long.MaxValue, advisor
    * r10), never a silent non-ANSI NULL. */
  def tauB(df: DataFrame, keyCol: String, xCellCol: String,
           yCellCol: String): DataFrame =
    tauBFromCells(
      df.groupBy(col(keyCol), col(xCellCol), col(yCellCol))
        .agg(count(lit(1)).as("__tau_c")),
      keyCol, xCellCol, yCellCol, "__tau_c")

  /** The τ-b finish off a MAINTAINED contingency census — the
    * streaming-monitor split (the PSI/KS/Qini twin discipline): cell
    * counts are algebraic, so a live (key, xcell, ycell, count) frame
    * under complete-mode aggregation IS the operator's state, and this
    * pure view finishes it identically to the batch path (`tauB` is
    * exactly census + this). Cells must be unique per (key, x, y). */
  def tauBFromCells(cellDf: DataFrame, keyCol: String, xCol: String,
                    yCol: String, cntCol: String): DataFrame = {
    val cells = cellDf
      .select(col(keyCol).as("key"), col(xCol).as("xc"),
        col(yCol).as("yc"), col(cntCol).cast("long").as("c"))
      .localCheckpoint(true) // within-cell stats + the cell-pair join
    val within = cells.groupBy("key").agg(
      sum(col("c")).as("n"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1) DIV 2")).as("tboth"))
    val l = cells.select(col("key"), col("xc").as("x1"),
      col("yc").as("y1"), col("c").as("c1"))
    val r = cells.select(col("key"), col("xc").as("x2"),
      col("yc").as("y2"), col("c").as("c2"))
    // each unordered cell pair once: strict lexicographic order
    val pairs = l.join(r, Seq("key"))
      .filter(col("x1") < col("x2") ||
        (col("x1") === col("x2") && col("y1") < col("y2")))
      .withColumn("m", expr("CAST(c1 AS DECIMAL(38,0)) * c2"))
    val between = pairs.groupBy("key").agg(
      sum(when((col("x2") - col("x1")) * (col("y2") - col("y1")) > 0,
        col("m")).otherwise(lit(0))).as("conc"),
      sum(when((col("x2") - col("x1")) * (col("y2") - col("y1")) < 0,
        col("m")).otherwise(lit(0))).as("disc"),
      sum(when(col("x1") === col("x2") && col("y1") =!= col("y2"),
        col("m")).otherwise(lit(0))).as("txo"),
      sum(when(col("y1") === col("y2") && col("x1") =!= col("x2"),
        col("m")).otherwise(lit(0))).as("tyo"))
    within.join(between, Seq("key"), "left")
      .na.fill(0L, Seq("conc", "disc", "txo", "tyo"))
      .select(col("key"), col("n").cast("long").as("n"),
        col("conc").cast("decimal(38,0)").as("concordant"),
        col("disc").cast("decimal(38,0)").as("discordant"),
        (col("txo") + col("tboth")).cast("decimal(38,0)").as("ties_x"),
        (col("tyo") + col("tboth")).cast("decimal(38,0)").as("ties_y"),
        col("tboth").cast("decimal(38,0)").as("ties_both"))
      // τ² on the 128-bit counters FIRST; only then narrow the readout
      .withColumn("tau2_pm", expr(
        """CAST(
          |  CASE WHEN concordant >= discordant THEN 1 ELSE -1 END
          |  * (10000 * (concordant - discordant) * (concordant - discordant)
          |     DIV nullif(
          |       (CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2 - ties_x)
          |       * (CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2 - ties_y), 0))
          |  AS BIGINT)""".stripMargin.replace("\n", " ")))
      .select(col("key").as(keyCol), col("n"),
        BlockingAudit.narrowChecked(col("concordant"), "tauB: concordant")
          .as("concordant"),
        BlockingAudit.narrowChecked(col("discordant"), "tauB: discordant")
          .as("discordant"),
        BlockingAudit.narrowChecked(col("ties_x"), "tauB: ties_x")
          .as("ties_x"),
        BlockingAudit.narrowChecked(col("ties_y"), "tauB: ties_y")
          .as("ties_y"),
        BlockingAudit.narrowChecked(col("ties_both"), "tauB: ties_both")
          .as("ties_both"),
        col("tau2_pm"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Distribution-DRIFT monitoring: how far each source's token
  * distribution sits from the blended corpus distribution — the readout
  * a data-mixture pipeline watches to catch a source going off-profile
  * (template spam, language shift, scraper breakage) between crawls.
  *
  * The statistic is KL(source ‖ corpus) over unigram token frequencies:
  *   KL_s = Σ_t p_st · ln(p_st / q_t),  p_st = c_st/N_s,  q_t = c_t/N.
  * Every token of a source appears in the corpus by construction, so
  * q_t > 0 and the sum is finite; KL ≥ 0 with equality iff the source
  * matches the blend exactly.
  *
  * FIXED-POINT portability: per-term contributions are quantized to
  * integer micro-nats with an explicit floor(x·1e6 + 0.5) — identical in
  * every engine, unlike `round()` whose half-way rule differs — and the
  * per-source SUM is then an integer sum, exact and order-independent.
  * A float sum of thousands of terms is order-dependent at the ulp level
  * and two engines never add in the same order; quantize-then-sum is the
  * standard trick for cross-engine-reproducible statistics (same family
  * as q49's quantize-before-rank). Caveat shared by every micro-nat
  * consumer (q65/q70): a term landing within an ulp of a quantum
  * boundary can still flip the floor between engines — the ≤1-ulp ln
  * spread makes exactness overwhelmingly likely, not guaranteed; it is
  * data-dependent in the same way q49's quantize-before-rank is.
  *
  * Scale shape: ONE tokenize scan; the (source, token) count table —
  * far smaller than the token stream — is checkpointed and feeds the
  * per-source totals, the corpus totals and the scoring join; joins key
  * on (token) resp. (source), both map-side-combined aggregations first,
  * so the only large shuffle is the initial (source, token) count. The
  * corpus grand total is a single driver scalar (same bounded-collect
  * pattern as Sampling.mixtureSelect's budget).
  */
object Drift {

  /** Per-source drift: n_tokens, n_distinct_tokens, kl_micros (micro-nats
    * of KL(source ‖ corpus), integer-exact cross-engine). */
  def tokenDrift(df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val counts = df.select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).as("c_st"))
      .localCheckpoint(true) // three consumers: src totals, corpus totals, scoring
    val src = counts.groupBy("source")
      .agg(sum(col("c_st")).as("n_s"), count(lit(1)).as("n_distinct"))
    val corpus = counts.groupBy("token").agg(sum(col("c_st")).as("c_t"))
    // coalesce: an empty input sums to NULL — nTotal 0 flows through to
    // an (correct) empty result instead of an NPE on getLong
    val bounds = src.agg(coalesce(sum(col("n_s")), lit(0L)),
      coalesce(max(col("n_s")), lit(0L))).head()
    val nTotal = bounds.getLong(0)
    val maxNs = bounds.getLong(1)
    // every product below is bounded by maxNs·N (c_st ≤ n_s ≤ maxNs,
    // c_t ≤ N): keeping that bound under 2^53 guarantees the long
    // multiplies are overflow-free in BOTH engines (Spark ANSI throws,
    // DuckDB errors — but only past 2^63) AND that the products convert
    // to double exactly, which the hash-exact claim rests on. Past the
    // bound, fail loudly with the remedy instead of drifting silently.
    require(maxNs.toDouble * nTotal.toDouble < 9007199254740992.0, // 2^53
      s"tokenDrift ratio form needs max(n_s)*N < 2^53 for exact double conversion " +
        s"(got max(n_s)=$maxNs, N=$nTotal); pre-divide the ratio (two rounded doubles, " +
        "a different fingerprint) or shard sources before calling")

    // p_st·ln(p_st/q_t) = (c_st/n_s)·ln((c_st·N)/(n_s·c_t)) — integer
    // products stay < 2^53 (guarded above); double division and
    // multiplication are correctly rounded IEEE so both engines see
    // bit-identical inputs to ln, and ln's ≤1-ulp engine spread vanishes
    // in the quantization (up to the boundary-flip caveat above).
    val term = (col("c_st").cast("double") / col("n_s")) *
      log((col("c_st") * lit(nTotal)).cast("double") / (col("n_s") * col("c_t")).cast("double"))
    counts
      .join(corpus, "token")
      .join(src, "source")
      .withColumn("term_micros", floor(term * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct_tokens"),
        sum(col("term_micros")).as("kl_micros"))
  }

  /** EMBEDDING-SPACE drift between groups: the pairwise cosine of group
    * CENTROIDS — "did src7's semantic center move away from the rest?" —
    * computed entirely from integers so the report is engine-exact.
    *
    * Quantize-then-sum (the [[tokenDrift]] discipline applied to
    * vectors): each element is quantized to `quant` units FIRST with the
    * explicit `floor(v·quant + 0.5)` rule (same everywhere, including
    * negatives — unlike `round()`, whose half-way convention this repo
    * does not trust cross-engine), so the per-(group, dim) centroid
    * sums are integer and order-free; dot
    * products and squared norms multiply those integer sums in
    * DECIMAL(38,0); the reported cosine divides the exact integers in
    * IEEE doubles (exact conversion while |dot| < 2^53, correctly
    * rounded mul/sqrt/div) — bit-identical across engines, no float
    * accumulation anywhere. Count normalization cancels in cosine, so
    * centroids stay as raw sums.
    *
    * Scale shape: one posexplode scan shuffles (group, dim, qv) with
    * map-side combine down to groups×dims rows; everything after —
    * norms, the dim-keyed pair join, the cosine — operates on the
    * groups×dims table, independent of corpus size. The centroid frame
    * is checkpointed once for its three consumers. */
  def centroidCosines(
      df: DataFrame,
      groupCol: String,
      vecCol: String,
      quant: Long = 1000L
  ): DataFrame = {
    require(quant >= 1L, "quant must be >= 1")
    val q = df
      .select(col(groupCol).as("grp"),
        // explicit float->DOUBLE cast BEFORE the arithmetic: the two
        // engines must not be left to promote FLOAT*INT differently
        posexplode(expr(
          s"transform($vecCol, v -> CAST(floor(CAST(v AS DOUBLE) * $quant + 0.5) AS BIGINT))")))
      .toDF("grp", "pos", "qv")
    val cent = q.groupBy("grp", "pos").agg(sum(col("qv")).as("s"))
      .localCheckpoint(true) // consumers: norms + both sides of the pair join
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val norms = cent.groupBy(col("grp"))
      .agg(sum(big(col("s")) * col("s")).cast("long").as("nrm"))
    val a = cent.select(col("grp").as("grp_a"), col("pos"), col("s").as("sa"))
    val b = cent.select(col("grp").as("grp_b"), col("pos"), col("s").as("sb"))
    a.join(b, Seq("pos"))
      .filter(col("grp_a") < col("grp_b"))
      .groupBy("grp_a", "grp_b")
      .agg(sum(big(col("sa")) * col("sb")).cast("long").as("dot"))
      .join(norms.select(col("grp").as("grp_a"), col("nrm").as("norm_a")), "grp_a")
      .join(norms.select(col("grp").as("grp_b"), col("nrm").as("norm_b")), "grp_b")
      .select(col("grp_a"), col("grp_b"), col("dot"), col("norm_a"), col("norm_b"),
        when(col("norm_a") > 0 && col("norm_b") > 0,
          col("dot").cast("double") /
            sqrt(col("norm_a").cast("double") * col("norm_b").cast("double")))
          .as("cosine"))
      .orderBy("grp_a", "grp_b")
  }

  /** POPULATION STABILITY INDEX between two sides of one frame — the
    * drift number a scorecard owner tracks per release: with cᵉ/cᵃ the
    * expected/actual cell counts and Tᵉ/Tᵃ the side totals,
    *
    *     PSI = Σ_cells (cᵉ/Tᵉ − cᵃ/Tᵃ)·ln((cᵉ·Tᵃ)/(cᵃ·Tᵉ))
    *
    * evaluated integer-exactly: the log ratio is quantized to
    * micro-nats per cell (the q70 construction), each cell's
    * contribution is the integer product (cᵉ·Tᵃ − cᵃ·Tᵉ)·lnr_micro,
    * and the single division by Tᵉ·Tᵃ happens once on the exact sum:
    *
    *     psi_micro = Σ (cᵉ·Tᵃ − cᵃ·Tᵉ)·lnr_micro  DIV  (Tᵉ·Tᵃ)
    *
    * Every term is ≥ 0 ((p−q) and ln(p/q) share a sign), so psi_micro
    * is monotone in drift. Cells present on only ONE side have an
    * infinite PSI term; they are excluded from the sum and surfaced in
    * `n_one_sided` instead of poisoning the number — rule of thumb:
    * psi < 0.1 (100 000 micro) stable, > 0.25 act.
    *
    * One count-shuffle to the (cell, side) frame; everything after is
    * cell-domain-sized.
    *
    * @param df       rows from both populations
    * @param expected boolean column — true rows form the EXPECTED side
    * @param cellCol  the banded/categorical cell
    * @return one row per cell seen anywhere (cell, n_expected,
    *         n_actual, lnr_micro, term — NULL for one-sided cells) with
    *         psi_micro / n_one_sided / totals crossed in
    */
  def psiReport(df: DataFrame, expected: Column, cellCol: Column): DataFrame =
    psiFromCells(df.select(cellCol.as("cell"), expected.as("e"))
      .groupBy("cell")
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("ce"),
        sum(when(!col("e"), 1L).otherwise(0L)).as("ca")))

  /** The PSI finish from an ALREADY-MAINTAINED `(cell, ce, ca)` count
    * frame — the monitoring deployment shape: the cell counts are plain
    * streaming-safe sum-aggregations (a live monitor maintains them per
    * micro-batch), and this finish reads the state. The StreamingSpec
    * twin pins stream-built cells ≡ batch. */
  def psiFromCells(cellCounts: DataFrame): DataFrame = {
    val cells = cellCounts.localCheckpoint(true) // totals + terms: one pass
    val tot = cells.agg(sum(col("ce")).cast("long").as("te"),
      sum(col("ca")).cast("long").as("ta"))
    val terms = cells.crossJoin(tot)
      .withColumn("lnr_micro", expr(
        """CASE WHEN ce > 0 AND ca > 0 THEN
          |CAST(floor(ln((CAST(ce AS DOUBLE) * ta) / (CAST(ca AS DOUBLE) * te))
          |  * 1e6 + 0.5) AS BIGINT) END""".stripMargin))
      .withColumn("term", expr(
        """CASE WHEN ce > 0 AND ca > 0 THEN
          |(CAST(ce AS DECIMAL(38,0)) * ta - CAST(ca AS DECIMAL(38,0)) * te)
          |  * lnr_micro END""".stripMargin))
    val summary = terms.agg(
        expr("CAST(sum(term) DIV (max(CAST(te AS DECIMAL(38,0))) * max(ta)) AS BIGINT)")
          .as("psi_micro"),
        sum(when(col("lnr_micro").isNull, 1L).otherwise(0L)).as("n_one_sided"),
        max(col("te")).as("n_expected_total"), max(col("ta")).as("n_actual_total"))
    terms.select(col("cell"), col("ce").as("n_expected"), col("ca").as("n_actual"),
        col("lnr_micro"), col("term").cast("long").as("term"))
      .crossJoin(summary)
      .orderBy("cell")
  }

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV TEST, exact — the nonparametric
    * complement of [[psiReport]]: PSI needs pre-chosen bins and goes
    * blind between their edges; KS compares the FULL empirical CDFs, so
    * a shape change PSI's bins straddle still registers. Per key:
    *
    *     D = max_v |F_a(v) − F_b(v)|
    *       = max_v |n_b·C_a(v) − n_a·C_b(v)| / (n_a·n_b)
    *
    * computed entirely in cross-multiplied integers (no 1/n floats);
    * the α=.05 rejection c(α)=1.358 enters as the EXACT rational
    * (1358/1000)², i.e.
    *
    *     reject ⇔ D_int² · 10⁶ > 1844164 · (n_a+n_b) · n_a · n_b
    *
    * — no rounded constant, no sqrt, engine-independent to the bit.
    *
    * Scale shape: one (key, value)-grain aggregate (map-side combined),
    * then per-key ordered windows over the DISTINCT-VALUE frame — fine
    * for measures with bounded cardinality (prices in cents, latencies
    * in ms); for truly continuous 100 TB measures, quantize `valueCol`
    * to the precision you care about first and the window shrinks to
    * the quantized domain.
    *
    * @param df     observations
    * @param keyCol per-key tests run independently
    * @param valueCol ordered measure (any orderable type)
    * @param inA    predicate splitting the rows into sample A vs B
    * @return key, n_a, n_b, d_pm (10⁴·D truncated), reject
    */
  def ksTwoSample(df: DataFrame, keyCol: String, valueCol: String,
      inA: Column): DataFrame =
    ksFromCounts(df
      .groupBy(col(keyCol).as("key"), col(valueCol).as("v"))
      .agg(sum(when(inA, 1L).otherwise(0L)).as("ca"),
        sum(when(inA, 0L).otherwise(1L)).as("cb")))

  /** The stateless KS finish over pre-aggregated (key, v, ca, cb) cell
    * counts — the mergeable state a streaming ingest maintains (cell
    * sums commute with micro-batching), mirroring [[psiFromCells]]:
    * aggregate live, finish on demand. */
  def ksFromCounts(counts: DataFrame): DataFrame = {
    val wCum = Window.partitionBy("key").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("key")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("cum_a", sum(col("ca")).over(wCum))
      .withColumn("cum_b", sum(col("cb")).over(wCum))
      .withColumn("n_a", sum(col("ca")).over(wTot))
      .withColumn("n_b", sum(col("cb")).over(wTot))
      .withColumn("d_int",
        abs(col("n_b").cast("decimal(38,0)") * col("cum_a")
          - col("n_a").cast("decimal(38,0)") * col("cum_b")))
      .groupBy("key")
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("d_int")).as("_d"))
      .select(col("key"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          expr("(10000 * _d) DIV (CAST(n_a AS DECIMAL(38,0)) * n_b)"))
          .as("d_pm"),
        (col("_d").cast("decimal(38,0)") * col("_d") * 1000000L >
          lit(1844164L).cast("decimal(38,0)") * (col("n_a") + col("n_b"))
            * col("n_a") * col("n_b")).as("reject"))
      .orderBy("key")
  }
}

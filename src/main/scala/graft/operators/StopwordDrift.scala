package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source STOPWORD-PROFILE DRIFT: total-variation distance, in
  * truncating permyriad, between each source's distribution over a
  * pinned function-word vocabulary and the corpus-wide profile. The
  * cheap register-language drift alarm: content words shift with
  * topic, but the *function-word* mix is stable within a register, so
  * a source whose stopword profile walks away from the corpus is
  * machine-generated, boilerplate, or mis-languaged — worth a look
  * before it trains.
  *
  * TV is the log-free distance on purpose (house integer-exactness
  * rule): with per-source stopword counts o_w, totals s = Σ o_w,
  * corpus counts c_w, T = Σ c_w,
  *
  *   TV = ½ Σ_w |o_w/s − c_w/T|
  *      = Σ_w |o_w·T − c_w·s| / (2·s·T)
  *
  * — one rational with all-integer numerators. Words ABSENT from a
  * source still contribute (|0 − c_w·s| = c_w·s); rather than densify
  * source×vocab, the absent mass folds in CLOSED FORM off the sparse
  * cells: Σ_absent c_w·s = s·(T − Σ_present c_w). Width envelope:
  * o_w·T ≤ tokens² ≤ 10³⁰ at 10¹⁵ stopword tokens — DECIMAL(38,0)
  * holds to far past 100 TB of text.
  *
  * Scale shape: one corpus scan exploding ONLY the pinned-vocabulary
  * hits (the filter runs inside the scan, before the shuffle), one
  * shuffle to the (source × vocab)-bounded cell frame; everything
  * after is arithmetic on that tiny frame (corpus rollup, per-source
  * totals, and the scalar grand total all broadcast back onto it).
  *
  * Readout per source: `sw_tokens` (s), `tv_pm`, and `top_drift_word`
  * — the vocabulary word with the largest |o_w·T − c_w·s| among words
  * PRESENT in the source (ties broken toward the lexicographically
  * larger word; a word entirely absent from the source is attributed
  * to the aggregate TV but not eligible as the headline word — with a
  * pinned function-word list, a register where one of them never
  * occurs IS the story the tv_pm number already tells). Sources with
  * zero vocabulary hits have no defined profile and are absent.
  */
object StopwordDrift {

  /** The streaming-legal CENSUS stage: one (source × vocab)-bounded
    * count aggregate — all-algebraic, so a live complete-mode census of
    * these cells IS the drift monitor's entire state (unlike the
    * datasheet's duplicate leg, NOTHING here is corpus-relative beyond
    * the cells themselves: the corpus profile, source totals, and grand
    * total all ROLL UP from the cells, so the finish needs no second
    * stored input). Output: (srcCol, word, n_tokens). */
  def driftCells(df: DataFrame, srcCol: String, textCol: String,
                 vocabulary: Seq[String]): DataFrame = {
    require(vocabulary.nonEmpty && vocabulary.size <= 4096,
      s"StopwordDrift: vocabulary of ${vocabulary.size} outside [1, 4096]" +
        " — the cell frame is sources × vocab and must stay tiny")
    // typed-literal membership test (round-11 advisor: interpolating the
    // words into SQL text breaks on quotes/backslashes in a PUBLIC-API
    // vocabulary). isin over typed literals rather than array_contains
    // on a lit array (round-12 advisor): In(>10 literals) optimizes to a
    // hashed InSet, while array_contains is an O(|vocab|) linear scan
    // per token — the scan-stage cost the 4096-word API bound relies on.
    df.select(col(srcCol),
        graft.functions.TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col(srcCol),
        explode(filter(col("_t"), x => x.isin(vocabulary: _*)))
          .as("word"))
      .groupBy(col(srcCol), col("word"))
      .agg(count(lit(1)).as("n_tokens"))
  }

  def profileDrift(df: DataFrame, srcCol: String, textCol: String,
                   vocabulary: Seq[String]): DataFrame =
    driftFromCells(driftCells(df, srcCol, textCol, vocabulary), srcCol)

  /** The TV finish off a maintained cell census: pure view, identical
    * to the batch path by construction ([[profileDrift]] routes through
    * it). `cells` carries (srcCol, word, n_tokens). */
  def driftFromCells(cellsIn: DataFrame, srcCol: String): DataFrame = {
    val cells = cellsIn.select(col(srcCol).as("_src"),
        col("word").as("_w"), col("n_tokens").cast("long").as("_o"))
      .localCheckpoint(true) // corpus rollup, source totals, drift finish
    val corpus = cells.groupBy(col("_w")).agg(sum(col("_o")).as("_c"))
    val perSrc = cells.groupBy(col("_src")).agg(sum(col("_o")).as("_s"))
    val total = corpus.agg(sum(col("_c")).as("_T")) // scalar broadcast
    cells.join(broadcast(corpus), Seq("_w"))
      .join(broadcast(perSrc), Seq("_src"))
      .crossJoin(broadcast(total))
      .groupBy(col("_src"))
      .agg(
        first(col("_s")).as("sw_tokens"),
        first(col("_T")).as("_tt"),
        sum(expr("abs(CAST(_o AS DECIMAL(38,0)) * _T" +
          " - CAST(_c AS DECIMAL(38,0)) * _s)")).as("_present_drift"),
        sum(expr("CAST(_c AS DECIMAL(38,0))")).as("_c_present"),
        max(struct(
          expr("abs(CAST(_o AS DECIMAL(38,0)) * _T" +
            " - CAST(_c AS DECIMAL(38,0)) * _s)").as("_d"),
          col("_w"))).as("_mx"))
      .select(col("_src").as(srcCol),
        col("sw_tokens").cast("long").as("sw_tokens"),
        // absent mass in closed form: s·(T − Σ_present c_w)
        expr("""CAST(10000 * (_present_drift
          |  + CAST(sw_tokens AS DECIMAL(38,0)) * (_tt - _c_present))
          | DIV (2 * CAST(sw_tokens AS DECIMAL(38,0)) * _tt) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("tv_pm"),
        col("_mx._w").as("top_drift_word"))
      .orderBy(srcCol)
  }
}

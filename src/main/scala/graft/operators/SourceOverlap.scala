package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source n-gram REDUNDANCY MATRIX: for every ordered source pair
  * (a, b), what fraction of b's distinct word-n-gram TYPES already
  * appears in a? The corpus-governance companion to the doc-pair
  * instruments (q261's shared-gram ladder, the dedup family): before
  * paying to dedup source b against source a, this readout says how
  * much of b is even candidate-redundant — and it is DIRECTIONAL
  * (a crawl that swallowed a curated set shows containment(a⊇b) ≈ 1
  * while containment(b⊇a) stays small), which symmetric dup rates
  * can't express.
  *
  * Scale shape (100 TB): ONE distinct-shuffle to (source, gram) TYPE
  * pairs — the only corpus-sized stage, and it map-side combines —
  * then an equi-join of that frame with itself on gram. Per-gram join
  * fan-out is bounded by the SOURCE DOMAIN (≤ `maxSources`, enforced
  * with a loud `require` off the already-computed per-source frame,
  * the Concentration discipline), so the join output is ≤ s² rows per
  * gram type and the final matrix is ≤ s² rows total. No collects, no
  * windows, no cross joins.
  *
  * Output is SPARSE: pairs sharing zero gram types are absent (the
  * reading for an absent pair is containment 0; densifying would need
  * a source×source cross product for rows that carry no signal).
  *
  * Readout per (src_a, src_b), a ≠ b: `grams_b` = b's distinct gram
  * types, `shared` = types in both, `containment_pm` = truncating
  * permyriad shared/grams_b.
  */
object SourceOverlap {

  def redundancyMatrix(df: DataFrame, srcCol: String, textCol: String,
                       n: Int, maxSources: Int = 64): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    // the house token split (TextAnalysis.tokens) + q261's gram build:
    // grams exist only when the doc holds >= n tokens (Spark's
    // sequence(1, 0) counts DOWN, so the short-doc case must be gated,
    // not left to an empty range)
    val grams = df
      .select(col(srcCol).as("_src"),
        graft.functions.TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col("_src"), explode(when(size(col("_t")) >= n,
        expr(s"transform(sequence(1, size(_t) - ${n - 1})," +
          s" i -> array_join(slice(_t, i, $n), ' '))"))
        .otherwise(expr("array()"))).as("_gram"))
      .distinct() // THE corpus-sized shuffle: (source, gram) TYPES
      .localCheckpoint(true) // feeds both join sides + the per-source census
    val perSrc = grams.groupBy(col("_src")).agg(count(lit(1)).as("grams_b"))
      .localCheckpoint(true)
    val nSrc = perSrc.count()
    require(nSrc <= maxSources,
      s"SourceOverlap: $nSrc sources exceeds the $maxSources bound the " +
        "s²-per-gram join fan-out is sized for — roll sources up to a " +
        "coarser taxonomy first (the matrix is unreadable past ~64 anyway)")
    grams.select(col("_src").as("src_a"), col("_gram"))
      .join(grams.select(col("_src").as("src_b"), col("_gram")), Seq("_gram"))
      .filter(col("src_a") =!= col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(perSrc.select(col("_src").as("src_b"), col("grams_b"))),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("grams_b"), col("shared"),
        expr("CAST(10000 * shared DIV grams_b AS BIGINT)")
          .as("containment_pm"))
      .orderBy("src_a", "src_b")
  }
}

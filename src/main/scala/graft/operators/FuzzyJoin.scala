package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FUZZY STRING JOIN (entity resolution): match left-side strings to
  * right-side strings within a Levenshtein edit-distance bound — the
  * dirty-key join of record linkage (typo'd titles, OCR'd names, vendor
  * feeds spelling the same entity three ways).
  *
  * The quadratic verify is avoided with the standard q-gram filter
  * stack (Gravano et al., "Approximate String Joins in a Database
  * (Almost) for Free", VLDB 2001):
  *   1. BLOCK: candidate pairs must share ≥1 character q-gram
  *      (inverted-index equi-join — never a cross join);
  *   2. COUNT FILTER: strings within edit distance k share at least
  *      `max(|a|,|b|) − (q−1) − q·k` q-grams — pairs below the bound
  *      are dropped BEFORE any distance is computed;
  *   3. LENGTH FILTER: `abs(|a| − |b|) ≤ k`;
  *   4. VERIFY: exact `levenshtein ≤ k` on the survivors only.
  * The count filter is evaluated on DISTINCT grams (set semantics): for
  * strings with internally repeated grams the set count can undershoot
  * the positional-gram bound and over-filter — a recall trade the
  * scaladoc owns, deterministic and replayed identically by the oracle.
  *
  * Scale shape: the inverted index carries (gram, id, len) — ids and an
  * 8-byte length, never the candidate pair's strings; `maxGramFreq`
  * drops stop-grams (the [[NearDup.jaccardPairs]] cap — a gram seen on
  * more than `maxGramFreq` right rows blocks nothing, it only floods);
  * the count filter is one map-side-combined groupBy on the pair id;
  * strings are re-attached to the SURVIVING pairs only, so the verify
  * join is candidate-sized, not index-sized.
  */
object FuzzyJoin {

  /** Distinct character q-grams of `s`; a string shorter than `q` yields
    * itself (its only "gram"), so short keys still block. */
  private def charGrams(s: Column, q: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(s) - (q - 1), lit(1))),
      i => s.substr(i, lit(q))))

  /** Pairs `(id_a, id_b, dist)` with `levenshtein(left.key, right.key)
    * ≤ maxDist`, candidates restricted by the q-gram filter stack above.
    * Null/empty keys never match. */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      idCol: String,
      q: Int = 4,
      maxDist: Int = 2,
      maxGramFreq: Int = 1000
  ): DataFrame = {
    require(q > 0 && maxDist >= 0, "q must be positive, maxDist non-negative")
    def prep(df: DataFrame, idAs: String, keyAs: String, lenAs: String): DataFrame =
      df.filter(col(keyCol).isNotNull && length(col(keyCol)) > 0)
        .select(col(idCol).as(idAs), col(keyCol).as(keyAs),
          length(col(keyCol)).as(lenAs))
    val l = prep(left, "id_a", "key_a", "len_a")
      .localCheckpoint(true) // two consumers: gram stream + verify re-attach
    val r = prep(right, "id_b", "key_b", "len_b")
      .localCheckpoint(true)

    val lg = l.select(col("id_a"), col("len_a"),
      explode(charGrams(col("key_a"), q)).as("gram"))
    val rg = r.select(col("id_b"), col("len_b"),
      explode(charGrams(col("key_b"), q)).as("gram"))
    // stop-gram cap on the RIGHT (index) side: doc-frequency over rows
    val indexed = {
      val freq = rg.groupBy("gram").agg(count(lit(1)).as("df_"))
        .filter(col("df_") <= maxGramFreq)
        .select("gram")
      rg.join(freq, "gram")
    }

    val cand = lg.join(indexed, "gram")
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"),
        first(col("len_a")).as("len_a"), first(col("len_b")).as("len_b"))
      // count + length filters — cheap integer tests before any distance
      .filter(col("n_shared") >=
        greatest(greatest(col("len_a"), col("len_b")) - (q - 1) - q * maxDist, lit(1)))
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .select("id_a", "id_b")

    cand
      .join(l.select("id_a", "key_a"), "id_a")
      .join(r.select("id_b", "key_b"), "id_b")
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }
}

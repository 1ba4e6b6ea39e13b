package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.plans.SketchFunctions

/** FEATURE-HASHING TEXT EMBEDDING — a dense d-dimensional integer vector
  * from token hashes: v[j] = Σ_tokens sign_j(token), where sign_j is bit
  * j of the token's portable 64-bit hash mapped to ±1. This is a random
  * projection with Rademacher entries (Achlioptas 2003: ±1 projections
  * preserve inner products in expectation like Gaussian ones), and
  * precisely the DENSE PRE-THRESHOLD STATE of SimHash — `operators/
  * NearDup.simhashPairs` keeps only sign(v[j]) as 64 bits; keeping the
  * magnitudes yields a vector whose cosine approximates token-set
  * similarity, usable anywhere an embedding column is (ANN top-k,
  * semantic dedup, centroid drift) WITHOUT an external model.
  *
  * Engine-exact by construction: integer sums of ±1 are order-free, so
  * embeddings, dot products and squared norms replay bit-identically in
  * any engine with the portable hash (the q127/q116 integer-first
  * discipline) — cosine only becomes IEEE double at the final division
  * of exact integers. Zero shuffle: one codegen'd projection per doc.
  *
  * `dim ≤ 64` draws all signs from one 64-bit hash; larger dims would
  * re-hash with a per-block salt (same construction, more hash calls) —
  * not needed for the similarity uses here, so not implemented.
  */
object HashEmbed {

  /** The embedding from an already-computed token-hash array. Callers
    * fanning out over many rows should MATERIALIZE the hash column
    * first (localCheckpoint, the repo's nested-HOF discipline):
    * Catalyst's CollapseProject inlines a hash subexpression into all
    * `dim` per-dimension aggregates, re-tokenizing and re-hashing the
    * text `dim` times per row otherwise — [[cosineTopK]] does this and
    * measured 2.4× faster for it. */
  def embedFromHashes(hashes: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 64, "dim must be in [1, 64] (one 64-bit hash)")
    transform(sequence(lit(0), lit(dim - 1)),
      j => aggregate(hashes, lit(0L), (acc, h) =>
        acc + (call_function("shiftright", h, j).bitwiseAND(lit(1L)) * 2L - 1L)))
  }

  /** `array<long>` of length `dim`: the hashed-sign embedding of
    * `text`'s token multiset. Empty/blank text embeds to the zero
    * vector (callers filter zero norms before cosine). */
  def embed(text: Column, dim: Int): Column =
    embedFromHashes(SketchFunctions.portableHash64(TextAnalysis.tokens(text)), dim)

  /** Exact integer dot product of an embedding column against a pinned
    * query vector (one plan literal). */
  def dotLit(v: Column, q: Seq[Long]): Column = {
    val ql = typedLit(q)
    aggregate(sequence(lit(1), lit(q.length)), lit(0L),
      (acc, i) => acc + element_at(v, i) * element_at(ql, i))
  }

  /** Exact integer squared norm. */
  def norm2(v: Column): Column =
    aggregate(v, lit(0L), (acc, x) => acc + x * x)

  /** Cosine top-k of `docs`' texts against the embedding of the row
    * with `idCol == queryId` (excluded from results): embeds in-scan,
    * scores with exact integer dot/norms, divides once into IEEE
    * doubles. Zero-norm docs are excluded (cosine undefined). */
  def cosineTopK(
      docs: DataFrame, textCol: String, idCol: String,
      queryId: Long, k: Int, dim: Int): DataFrame = {
    // materialize the per-row hash array ONCE; the 16 per-dimension
    // aggregates then read it instead of re-tokenizing per dimension
    // (CollapseProject would inline it — the nested-HOF checkpoint
    // discipline, 2.4× on the sf0.1 corpus)
    val hashed = docs.select(col(idCol),
        SketchFunctions.portableHash64(TextAnalysis.tokens(col(textCol))).as("hs"))
      .localCheckpoint(true)
    val embedded = hashed.select(col(idCol), embedFromHashes(col("hs"), dim).as("v"))
    val qRows = embedded.filter(col(idCol) === queryId).take(1)
    require(qRows.nonEmpty, s"query id $queryId not present in '$idCol'")
    val q = qRows.head.getSeq[Long](1)
    require(q.exists(_ != 0L), s"query $queryId has a zero embedding")
    val qn = q.map(x => x * x).sum
    embedded.filter(col(idCol) =!= queryId)
      .withColumn("dot", dotLit(col("v"), q))
      .withColumn("n2", norm2(col("v")))
      .filter(col("n2") > 0L)
      // norms multiply as DOUBLES: n2·qn in Long overflows for long
      // repetitive docs (n2 ≤ dim·t², two ~15k-token docs wrap
      // negative → NaN cosine, which Spark ranks FIRST on desc)
      .withColumn("cosine",
        col("dot").cast("double") /
          sqrt(col("n2").cast("double") * lit(qn.toDouble)))
      .select(col(idCol), col("dot"), col("n2"), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}

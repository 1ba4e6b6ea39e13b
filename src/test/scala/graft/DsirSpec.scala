package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // pool of two "registers": target-like docs built from one vocabulary,
  // off-target docs from a disjoint one — the separation DSIR exists to make
  private val targetish = Seq(
    (0L, "a", "the model learns the data distribution well"),
    (1L, "a", "the data distribution shifts and the model adapts"),
    (2L, "b", "the model and the data agree on the distribution"))
  private val offish = Seq(
    (10L, "a", "zzz qqq www eee rrr ttt yyy uuu"),
    (11L, "b", "qqq zzz eee www ttt rrr uuu yyy"),
    (12L, "b", "www eee zzz qqq yyy ttt rrr uuu"))

  private def pool = (targetish ++ offish).toDF("doc_id", "source", "text")
  private def target = targetish.toDF("doc_id", "source", "text")

  test("target-like documents outweigh off-target documents") {
    val w = Dsir.importanceWeights(pool, target, "text", "doc_id", "source")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lw_micros")).toMap
    val minTargetish = targetish.map(t => w(t._1)).min
    val maxOffish = offish.map(t => w(t._1)).max
    assert(minTargetish > maxOffish,
      s"every target-vocab doc must outscore every off-vocab doc, got $w")
    // off-target grams are absent from the target model: their terms are
    // strictly negative log ratios
    assert(offish.forall(t => w(t._1) < 0L))
  }

  test("selection keeps the per-stratum quota with deterministic tiebreak") {
    val sel = Dsir.dsirSelect(pool, target, "text", "doc_id", "source",
        keepNum = 1, keepDen = 2) // ceil(n/2) per source
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("selected")).toMap
    // source a: 3 docs -> keep 2 (the two target-like); source b: 3 -> keep 2
    assert(sel(0L) && sel(1L) && !sel(10L))
    assert(sel(2L))
    assert(Seq(11L, 12L).count(sel) == 1, "exactly one off-target b doc fills b's quota")
  }

  test("native ngram stream ≡ HOF string formulation (multiplicity + order + hash)") {
    import graft.plans.SketchFunctions
    import graft.functions.TextAnalysis
    val texts = Seq("a b a b a", "one two", "solo", "", "x  y\tz").toDF("text")
    val t = TextAnalysis.tokens(col("text"))
    val hof = when(size(t) >= 2,
        transform(sequence(lit(0), size(t) - 2),
          i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    val viaHof = texts.select(SketchFunctions.portableHash64(hof).as("h"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val native = texts.select(SketchFunctions.portableNgramHashes(t, 2).as("h"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(native == viaHof)
  }

  test("gram-less and empty inputs are handled") {
    val tiny = Seq((0L, "a", "word"), (1L, "a", "two tokens")).toDF("doc_id", "source", "text")
    val w = Dsir.importanceWeights(tiny, tiny.filter($"doc_id" === 1), "text", "doc_id", "source")
      .collect()
    // the one-token doc has no bigrams and is absent
    assert(w.map(_.getAs[Long]("doc_id")).toSet == Set(1L))
    // empty target: every term is the uniform-vs-raw ratio, still finite
    val w2 = Dsir.importanceWeights(tiny, tiny.filter($"doc_id" < 0), "text", "doc_id", "source")
      .collect()
    assert(w2.length == 1 && w2.head.getAs[Long]("n_grams") == 1L)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Keyphrase

class KeyphraseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pmiCollocations ranks a locked pair above independent fillers") {
    import spark.implicits._
    // "red wine" always co-occur; "data" pairs with everything
    val docs = (1 to 20).map(_ => "red wine data table data row") ++
      (1 to 20).map(_ => "data red wine row data table")
    val r = Keyphrase.pmiCollocations(docs.toDF("text"), "text",
      minPair = 5L, topK = 10)
      .select("w1", "w2", "n_pair", "lift_micro")
      .as[(String, String, Long, Long)].collect().toSeq
    val byPair = r.map(x => (x._1, x._2) -> x._4).toMap
    assert(byPair.contains(("red", "wine")))
    // every doc has exactly one red->wine adjacency
    assert(r.find(x => x._1 == "red" && x._2 == "wine").get._3 === 40L)
    // the locked collocation outscores the promiscuous filler bigrams
    val fillers = r.filter(x => x._1 == "data" || x._2 == "data").map(_._4)
    assert(fillers.forall(_ < byPair(("red", "wine"))))
  }

  test("pmiCollocations respects the minPair noise floor") {
    import spark.implicits._
    val docs = Seq("a b", "a b", "c d") // c->d appears twice short of floor=3
    val r = Keyphrase.pmiCollocations(docs.toDF("text"), "text",
      minPair = 2L, topK = 10)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(r.contains(("a", "b")) && !r.contains(("c", "d")))
  }

  test("rakeKeyphrases splits at stopwords and scores degree/freq") {
    import spark.implicits._
    val docs = Seq(
      (1L, "deep learning of the neural network"),
      (2L, "deep learning and neural network"),
      (3L, "network"))
      .toDF("doc_id", "text")
    val r = Keyphrase.rakeKeyphrases(docs, "doc_id", "text",
      stopwords = Seq("the", "a", "an", "and", "of", "to", "is", "in", "on", "for"),
      maxLen = 4, topK = 10)
      .select("phrase", "plen", "phrase_freq", "score_micro")
      .as[(String, Long, Long, Long)].collect().toSeq
    val m = r.map(x => x._1 -> x).toMap
    // stopwords never appear inside phrases
    assert(r.forall(p => !p._1.split(" ").exists(
      Set("the", "a", "an", "and", "of")(_))))
    assert(m("deep learning")._3 === 2L) // appears in docs 1 and 2
    // word scores: deep/learning freq 2 degree 4 -> 2e6 each;
    // neural freq 2 degree 4 -> 2e6; network freq 3 degree 5 ->
    // 1666666; phrase "neural network" = 3666666
    assert(m("deep learning")._4 === 4000000L)
    assert(m("neural network")._4 === 3666666L)
    assert(m("network")._4 === 1666666L)
    // multi-word phrases outrank the lone unigram
    assert(m("deep learning")._4 > m("network")._4)
  }

  test("textRank: the hub of the co-occurrence star ranks first") {
    import spark.implicits._
    // every adjacency touches 'spark'; 'scan' co-occurs once in the
    // whole corpus -> pruned by minCooc=2
    val docs = Seq("spark join spark join spark scan",
      "spark join spark join spark", "spark join")
    val r = Keyphrase.textRank(docs.toDF("text"), "text",
      stopwords = Seq("the"), minCooc = 2L, iterations = 10, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(r.map(_._1) == Seq("join", "spark") ||
      r.map(_._1) == Seq("spark", "join"))
    assert(!r.map(_._1).contains("scan"))
    // a 2-node symmetric graph is PageRank's exact fixed point
    assert(r.forall(_._2 == 1000000L))
  }

  test("textRank: stopwords are removed BEFORE adjacency is formed") {
    import spark.implicits._
    // 'red the wine' x3: with 'the' dropped first, red-wine are adjacent
    val docs = Seq.fill(3)("red the wine")
    val r = Keyphrase.textRank(docs.toDF("text"), "text",
      stopwords = Seq("the"), minCooc = 2L, iterations = 3, topK = 5)
      .as[(String, Long)].collect().toSeq
    assert(r.map(_._1).toSet == Set("red", "wine"))
  }
}

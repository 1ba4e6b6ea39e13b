package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DEPTH-2 CART — a classification tree over BINNED integer features,
  * trained by exact Gini-impurity minimization in truncating integer
  * fixed point (micros), so a SQL oracle replays every split decision
  * bit-for-bit. The interpretable-segmentation workhorse: "which two
  * feature cuts explain this outcome" as a 5-7 row report, not a model
  * binary.
  *
  * Split selection: for a node with (n, pos), every (feature, threshold)
  * candidate — threshold ranges over the feature's observed bin values,
  * rows with value <= threshold go left — is scored by the weighted
  * child impurity
  *   wg = (nL·gini(L) + nR·gini(R)) DIV n,
  *   gini = (2·r·(1e6−r)) DIV 1e6,  r = (1e6·pos) DIV n
  * (the 2p(1−p) binary-Gini form keeps every intermediate ≤ 2e12 — no
  * overflow at any corpus size, unlike the pos²/n² form). The argmin
  * with (wg asc, feature asc, threshold asc) tie-break is fully
  * deterministic; a node splits only if its gain (parent gini − wg) is
  * STRICTLY positive, otherwise it is a terminal leaf and emits no
  * children — pure nodes stop exactly like textbook CART.
  *
  * SCALE SHAPE: the row frame is melted once per node into a
  * (feature, bin) aggregate — one map-side-combined shuffle down to a
  * domain-sized frame (|features| × |bins| rows); candidate scoring is
  * a cumulative window over THAT frame, never over rows. Node subsets
  * are filters on one localCheckpoint'd projection (no re-read, no
  * reshuffle). The driver collects only the tree itself — one stats row
  * and one best-split row per node, ≤ 10 scalar rows total for depth 2
  * (the bounded-collect discipline of the pinned-centroid queries).
  */
object CartTree {

  private case class Split(feature: String, thr: Long, wg: Long,
                           nl: Long, posl: Long)

  private def giniSql(pos: String, n: String): String = {
    val r = s"((1000000 * $pos) DIV $n)"
    s"((2 * $r * (1000000 - $r)) DIV 1000000)"
  }

  private def giniOf(pos: Long, n: Long): Long = {
    val r = 1000000L * pos / n
    2L * r * (1000000L - r) / 1000000L
  }

  private def nodeStats(sub: DataFrame): (Long, Long) = {
    val r = sub.agg(count(lit(1)), coalesce(sum(col("y")), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Best (feature, threshold) of one node subset by weighted child
    * Gini, or None when no candidate improves STRICTLY on the parent.
    * The melt/groupBy/window shape collapses rows to a (feature, bin)
    * frame before any scoring; the collect is the single decision row. */
  private def bestSplit(sub: DataFrame, features: Seq[String], n: Long,
                        pos: Long): Option[Split] = {
    val melted = sub.select(explode(array(features.map(f =>
        struct(lit(f).as("f"), col(f).as("v"))): _*)).as("fv"), col("y"))
      .select(col("fv.f").as("f"), col("fv.v").as("v"), col("y"))
    val byF = Window.partitionBy("f").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val best = melted.groupBy("f", "v")
      .agg(count(lit(1)).as("bn"), sum(col("y")).as("bpos"))
      .withColumn("nl", sum(col("bn")).over(byF))
      .withColumn("posl", sum(col("bpos")).over(byF))
      .filter(col("nl") < n) // right side must be non-empty
      .select(col("f"), col("v"),
        expr(s"(nl * ${giniSql("posl", "nl")} + ($n - nl) * " +
          s"${giniSql(s"($pos - posl)", s"($n - nl)")}) DIV $n").as("wg"),
        col("nl"), col("posl"))
      .orderBy(col("wg").asc, col("f").asc, col("v").asc)
      .limit(1)
      .collect() // bounded: the single split decision, not data
    best.headOption
      .map(r => Split(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .filter(s => giniOf(pos, n) - s.wg > 0)
  }

  /** Fit a depth-2 tree of `df` on integer-valued (binned) `features`
    * predicting boolean `labelCol`. Returns one row per tree node —
    * `root`, its children `L`/`R`, grandchildren `LL`/`LR`/`RL`/`RR`
    * (children/grandchildren only where the parent actually split):
    * (node, n, pos, rate_micro, split_feature, split_thr, gain_micro),
    * split columns NULL on leaves. Requires an informative root split. */
  def fitDepth2(df: DataFrame, features: Seq[String], labelCol: String): DataFrame = {
    require(features.nonEmpty && features.size <= 8, "1..8 binned features")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(
        features.map(f => col(f).cast("long").as(f)) :+
          when(col(labelCol), 1L).otherwise(0L).as("y"): _*)
      .localCheckpoint(true) // filtered per node; never re-read from source

    val out = mutable.Buffer
      .empty[(String, Long, Long, Long, Option[String], Option[Long], Option[Long])]

    def emit(node: String, n: Long, pos: Long, split: Option[Split]): Unit =
      out += ((node, n, pos, 1000000L * pos / n,
        split.map(_.feature), split.map(_.thr),
        split.map(s => giniOf(pos, n) - s.wg)))

    def leftOf(s: Split) = col(s.feature) <= s.thr

    val (nR, pR) = nodeStats(base)
    require(nR > 0, "empty training frame")
    val rootSplit = bestSplit(base, features, nR, pR)
    require(rootSplit.isDefined, "no informative root split (gain 0)")
    emit("root", nR, pR, rootSplit)

    for ((childTag, childSub) <- Seq(
        "L" -> base.filter(leftOf(rootSplit.get)),
        "R" -> base.filter(!leftOf(rootSplit.get)))) {
      val sub = childSub.localCheckpoint(true) // reused by split + 2 leaves
      val (n, pos) = nodeStats(sub)
      val split = bestSplit(sub, features, n, pos)
      emit(childTag, n, pos, split)
      split.foreach { s =>
        for ((leafTag, leafSub) <- Seq(
            s"${childTag}L" -> sub.filter(leftOf(s)),
            s"${childTag}R" -> sub.filter(!leftOf(s)))) {
          val (ln, lpos) = nodeStats(leafSub)
          emit(leafTag, ln, lpos, None) // depth cap: grandchildren are leaves
        }
      }
    }

    out.toSeq
      .toDF("node", "n", "pos", "rate_micro", "split_feature", "split_thr",
        "gain_micro")
      .orderBy("node")
  }

  /** BAGGED STUMPS — a deterministic mini random forest: `bags` (odd)
    * depth-1 trees, each fit on the half of the data its md5 bag keeps
    * (subagging via [[Sampling.bucket]]-style content hashing — the
    * bag assignment follows from the row KEY alone, so the ensemble is
    * reproducible across runs, partitionings, and engines, unlike
    * `sample()`). Each stump votes the majority label of the training
    * side a row falls in; the ensemble is the unweighted majority of
    * stump votes (odd `bags` ⇒ no ties). Accuracy of every member and
    * of the ensemble is evaluated over the FULL frame in ONE aggregate
    * pass — the classic variance-reduction readout (ensemble ≥ the
    * typical member) as a verifiable table.
    *
    * Scale shape: per bag, one (feature, bin) melt-aggregate and one
    * decision-row collect (the [[fitDepth2]] discipline); the final
    * accuracy pass evaluates all stump votes + the ensemble vote as
    * literal-threshold expressions in a single scan. Driver sees
    * `bags` split rows and one accuracy row.
    *
    * @return (member, split_feature, split_thr, acc_micro) — one row
    *         per bag ("bag1"..) + one "ensemble" row (split cols NULL)
    */
  def baggedStumps(df: DataFrame, features: Seq[String], labelCol: String,
                   keyCol: String, bags: Int): DataFrame = {
    require(bags >= 1 && bags <= 15 && bags % 2 == 1, "bags odd, 1..15")
    require(features.nonEmpty && features.size <= 8, "1..8 binned features")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(
        features.map(f => col(f).cast("long").as(f)) ++
          Seq(when(col(labelCol), 1L).otherwise(0L).as("y"),
            col(keyCol).as("k")): _*)
      .localCheckpoint(true) // one build; filtered per bag + final pass

    // fit one stump per bag; carry the bag's (n, pos) for the right-side
    // majority
    val stumps = (1 to bags).map { b =>
      val sub = base.filter(Sampling.bucket(col("k"), s"bag$b") < 5000)
      val (n, pos) = nodeStats(sub)
      require(n > 0, s"bag $b is empty")
      val s = bestSplit(sub, features, n, pos)
      require(s.isDefined, s"bag $b has no informative split")
      (s.get, n, pos)
    }

    // each stump's vote as a literal-threshold expression: a side votes
    // its TRAINING-majority label (rate >= 1/2 -> 1); evaluated over the
    // full frame, all stumps + ensemble in one scan
    val voteCols = stumps.map { case (s, n, pos) =>
      val leftVote = if (1000000L * s.posl / s.nl >= 500000L) 1L else 0L
      val rightVote =
        if (1000000L * (pos - s.posl) / (n - s.nl) >= 500000L) 1L else 0L
      when(col(s.feature) <= s.thr, lit(leftVote)).otherwise(lit(rightVote))
    }
    val ensemble = when(
      voteCols.reduce(_ + _) * 2 > bags, 1L).otherwise(0L)
    val accExprs = (voteCols :+ ensemble).map(v =>
      sum(when(v === col("y"), 1L).otherwise(0L)))
    val accRow = base.agg(count(lit(1)), accExprs: _*).head()
    val total = accRow.getLong(0)
    def accMicro(i: Int): Long = 1000000L * accRow.getLong(i + 1) / total

    val rows = stumps.zipWithIndex.map { case ((s, _, _), i) =>
      (s"bag${i + 1}", Option(s.feature), Option(s.thr), accMicro(i))
    } :+ (("ensemble", Option.empty[String], Option.empty[Long],
      accMicro(bags)))
    rows.toDF("member", "split_feature", "split_thr", "acc_micro")
      .orderBy("member")
  }

  /** Weighted [[bestSplit]]: identical melt/cumulate/score shape with
    * per-row integer weights — bn/bpos become Σw and Σw·y, so the
    * weighted Gini reranks candidates as boosting re-emphasizes the
    * hard rows. (nW, posW) are the WEIGHTED totals. */
  private def bestSplitW(sub: DataFrame, features: Seq[String],
                         nW: Long, posW: Long): Option[Split] = {
    val melted = sub.select(explode(array(features.map(f =>
        struct(lit(f).as("f"), col(f).as("v"))): _*)).as("fv"),
        col("y"), col("w"))
      .select(col("fv.f").as("f"), col("fv.v").as("v"), col("y"), col("w"))
    val byF = Window.partitionBy("f").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val best = melted.groupBy("f", "v")
      .agg(sum(col("w")).as("bn"), sum(col("w") * col("y")).as("bpos"))
      .withColumn("nl", sum(col("bn")).over(byF))
      .withColumn("posl", sum(col("bpos")).over(byF))
      .filter(col("nl") < nW)
      .select(col("f"), col("v"),
        expr(s"(nl * ${giniSql("posl", "nl")} + ($nW - nl) * " +
          s"${giniSql(s"($posW - posl)", s"($nW - nl)")}) DIV $nW").as("wg"),
        col("nl"), col("posl"))
      .orderBy(col("wg").asc, col("f").asc, col("v").asc)
      .limit(1)
      .collect() // bounded: the single split decision, not data
    best.headOption
      .map(r => Split(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .filter(s => giniOf(posW, nW) - s.wg > 0)
  }

  /** BOOSTED STUMPS — deterministic integer boosting, the sequential
    * sibling of [[baggedStumps]]: `rounds` (odd) depth-1 trees fit in
    * sequence, each on the SAME frame under integer row weights that
    * DOUBLE on every row the previous stump misclassified (the ×2
    * multiplier replaces AdaBoost's real-valued exp(α) — fully
    * integer, so the trajectory is bit-replayable in SQL). Where
    * bagging reduces variance by averaging independent fits, boosting
    * reduces bias: each stump's weighted split search is pulled toward
    * the rows its predecessors get wrong, so member 2+ typically picks
    * a DIFFERENT feature/threshold than a refit of member 1 would.
    *
    * Votes: a side votes its training-weighted majority (2·posl ≥ nl);
    * the ensemble is the unweighted majority of the odd member votes.
    * Per member the WEIGHTED error under its own training weights and
    * the unweighted full-frame accuracy are both reported; the
    * ensemble row reports accuracy only.
    *
    * Scale shape: per round one weighted melt-aggregate + one
    * 1-row decision collect (the [[fitDepth2]] discipline) and one
    * lazily-checkpointed reweight column; the final pass evaluates all
    * member votes + the ensemble as literal-threshold expressions in a
    * single scan.
    *
    * @return (member, split_feature, split_thr, vote_left, vote_right,
    *         werr_micro, acc_micro) — "round1".."roundR" + "ensemble"
    */
  def boostedStumps(df: DataFrame, features: Seq[String], labelCol: String,
                    rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 9 && rounds % 2 == 1, "rounds odd, 1..9")
    require(features.nonEmpty && features.size <= 8, "1..8 binned features")
    val spark = df.sparkSession
    import spark.implicits._

    var cur = df.select(
        features.map(f => col(f).cast("long").as(f)) :+
          when(col(labelCol), 1L).otherwise(0L).as("y"): _*)
      .withColumn("w", lit(1L))
      .localCheckpoint(true)

    final case class Stump(s: Split, lv: Long, rv: Long, werrMicro: Long)
    val stumps = (1 to rounds).map { r =>
      val t = cur.agg(sum(col("w")), sum(col("w") * col("y"))).head()
      val (nW, posW) = (t.getLong(0), t.getLong(1))
      val s = bestSplitW(cur, features, nW, posW)
      require(s.isDefined, s"round $r has no informative weighted split")
      val sp = s.get
      val lv = if (2L * sp.posl >= sp.nl) 1L else 0L
      val rv = if (2L * (posW - sp.posl) >= (nW - sp.nl)) 1L else 0L
      val pred = when(col(sp.feature) <= sp.thr, lit(lv)).otherwise(lit(rv))
      val werr = cur.agg(
        sum(when(pred =!= col("y"), col("w")).otherwise(0L))).head().getLong(0)
      // reweight for the next round: misclassified rows double
      cur = cur.withColumn("w",
          when(pred === col("y"), col("w")).otherwise(col("w") * 2))
        .localCheckpoint(false) // next round's stats job materializes it
      Stump(sp, lv, rv, 1000000L * werr / nW)
    }

    val voteCols = stumps.map(st =>
      when(col(st.s.feature) <= st.s.thr, lit(st.lv)).otherwise(lit(st.rv)))
    val ensemble = when(voteCols.reduce(_ + _) * 2 > rounds, 1L).otherwise(0L)
    val accExprs = (voteCols :+ ensemble).map(v =>
      sum(when(v === col("y"), 1L).otherwise(0L)))
    val accRow = cur.agg(count(lit(1)), accExprs: _*).head()
    val total = accRow.getLong(0)
    def accMicro(i: Int): Long = 1000000L * accRow.getLong(i + 1) / total

    val rows = stumps.zipWithIndex.map { case (st, i) =>
      (s"round${i + 1}", Option(st.s.feature), Option(st.s.thr),
        Option(st.lv), Option(st.rv), Option(st.werrMicro), accMicro(i))
    } :+ (("ensemble", Option.empty[String], Option.empty[Long],
      Option.empty[Long], Option.empty[Long], Option.empty[Long],
      accMicro(rounds)))
    rows.toDF("member", "split_feature", "split_thr", "vote_left",
        "vote_right", "werr_micro", "acc_micro")
      .orderBy("member")
  }
}

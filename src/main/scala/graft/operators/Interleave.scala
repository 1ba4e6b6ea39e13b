package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEAM-DRAFT INTERLEAVING (Radlinski/Kurup/Joachims 2008) — the online
  * ranker-evaluation mechanism: to compare ranker A and ranker B on live
  * traffic, serve ONE list that interleaves both, then credit clicks to
  * the team that contributed the clicked item. Per draft round a coin
  * decides which team picks first; each team picks its highest-ranked
  * item not yet drafted. Unbiased in expectation, and — unlike
  * interleaving with a random device — REPRODUCIBLE here: the coin is
  * the salted md5 of (key, round), the q47/q274/q280 determinism move,
  * so the gate can hash the drafted lists.
  *
  * Execution shape: each side's top-k collapses to a per-key sorted
  * item array (two k-bounded collect_lists); the draft is ONE
  * `aggregate` fold over the round spine per key — the packed-series
  * discipline (Trend/Interval), no iterative jobs, no window; the
  * output explodes back to (key, pos, item, team). Everything after
  * the two rank frames is k-bounded per key.
  *
  * Items must be BIGINT-typed (the draft state is a typed array).
  * Keys present on only one side are dropped (nothing to interleave).
  * If the union of the two lists is smaller than `kOut`, the draft
  * simply ends early (exhausted teams skip their pick).
  */
object Interleave {

  def teamDraft(a: DataFrame, b: DataFrame, keyCol: String,
                itemCol: String, rankCol: String, kOut: Int,
                salt: String): DataFrame = {
    require(kOut >= 2 && kOut <= 20 && kOut % 2 == 0,
      "kOut in [2,20], even (two picks per round)")
    val rounds = kOut / 2
    def packed(df: DataFrame, as: String) = df
      .filter(col(rankCol) <= kOut)
      .groupBy(col(keyCol).as("key"))
      .agg(expr(s"transform(array_sort(collect_list(" +
        s"struct($rankCol AS r, CAST($itemCol AS BIGINT) AS it)))," +
        s" p -> p.it) AS $as"))
    // pick helpers, inlined (SQL has no let-binding): nI = the first
    // item of list X not yet drafted into P; try_element_at because an
    // exhausted list filters to empty and ANSI element_at would throw
    def nxt(xs: String, p: String) =
      s"try_element_at(filter($xs, e -> NOT array_contains($p, e)), 1)"
    def pickPair(x: String, y: String, tx: Int, ty: Int): String = {
      val n1 = nxt(x, "acc.p")
      val p1 = s"(CASE WHEN $n1 IS NULL THEN acc.p" +
        s" ELSE array_append(acc.p, $n1) END)"
      val t1 = s"(CASE WHEN $n1 IS NULL THEN acc.tm" +
        s" ELSE array_append(acc.tm, $tx) END)"
      val n2 = nxt(y, p1)
      s"""named_struct(
         |  'p',  CASE WHEN $n2 IS NULL THEN $p1
         |        ELSE array_append($p1, $n2) END,
         |  'tm', CASE WHEN $n2 IS NULL THEN $t1
         |        ELSE array_append($t1, $ty) END)""".stripMargin
    }
    val coin = s"(CAST(conv(substring(md5(concat(CAST(key AS STRING)," +
      s" '|$salt|', CAST(t AS STRING))), 1, 1), 16, 10) AS INT) % 2) = 0"
    val fold =
      s"""aggregate(sequence(0, ${rounds - 1}),
         |  named_struct('p', CAST(array() AS ARRAY<BIGINT>),
         |               'tm', CAST(array() AS ARRAY<INT>)),
         |  (acc, t) -> CASE WHEN $coin
         |    THEN ${pickPair("la", "lb", 0, 1)}
         |    ELSE ${pickPair("lb", "la", 1, 0)} END)""".stripMargin
    packed(a, "la").join(packed(b, "lb"), Seq("key"))
      .withColumn("_d", expr(fold.replace("\n", " ")))
      .select(col("key"), posexplode(expr(
        "zip_with(_d.p, _d.tm, (i, m) -> struct(i AS it, m AS team))"))
        .as(Seq("pos0", "s")))
      .select(col("key").as(keyCol), (col("pos0") + 1).as("pos"),
        col("s.it").as(itemCol), col("s.team").as("team"))
  }
}

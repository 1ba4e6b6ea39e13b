package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Sampling}

class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The md5 arm of each user under `salt`, read off the same assignment
    * the operator uses — tests engineer conversion AGAINST the real
    * assignment instead of assuming who lands where. */
  private def armsOf(users: Seq[Long], salt: String): Map[Long, Int] =
    Sampling.withSplitId(users.toDF("u"), "u", Seq(0.5, 0.5), salt, "variant")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private val users = (1L to 200L).toSeq
  private val arms = armsOf(users, "t")

  test("total separation between arms is significant; rates are exact per-myriad") {
    // every arm-0 user converts (15 rows), every arm-1 user doesn't (1 row)
    val events = users.flatMap { u =>
      val n = if (arms(u) == 0) 15 else 1
      Seq.fill(n)((u, "m"))
    }.toDF("user_id", "mtype")
    val Array(r) = Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 15, salt = "t").collect()
    val (nA, cA, nB, cB) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nA + nB == 200L)
    assert(cA == nA && cB == 0L)
    assert(r.getLong(5) == 10000L && r.getLong(6) == 0L)
    assert(r.getBoolean(7))
  }

  test("universal conversion: a = 0, verdict not significant") {
    val events = users.flatMap(u => Seq.fill(2)((u, "m"))).toDF("user_id", "mtype")
    val Array(r) = Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 2, salt = "t").collect()
    assert(r.getLong(2) == r.getLong(1) && r.getLong(4) == r.getLong(3))
    assert(!r.getBoolean(7))
  }

  test("zero converters: the metric vanishes from the report") {
    val events = users.map(u => (u, "m")).toDF("user_id", "mtype")
    assert(Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 99, salt = "t").collect().isEmpty)
  }

  test("custom per-user aggregate feeds the conversion predicate") {
    // conversion on the SUM of value, not the row count
    val events = users.flatMap { u =>
      val v = if (arms(u) == 0) 30.0 else 1.0
      Seq((u, "m", v))
    }.toDF("user_id", "mtype", "value")
    val Array(r) = Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 30.0,
      perUserAgg = sum(col("value")), salt = "t").collect()
    assert(r.getLong(2) == r.getLong(1) && r.getLong(4) == 0L)
    assert(r.getBoolean(7))
  }

  test("readout is deterministic across recomputes") {
    val events = users.flatMap(u => Seq.fill((u % 20).toInt + 1)((u, "m")))
      .toDF("user_id", "mtype")
    val mk = () => Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 10, salt = "t").collect().toSeq
    assert(mk() == mk())
  }

  test("CUPED: a perfect covariate (y = 2x) equalizes adjusted means and reports full variance reduction") {
    // x_u = (u mod 10) + 1 pre-cutoff rows, y_u = 2·x_u post-cutoff rows:
    // θ = 2 exactly, ρ² = 1, and the adjustment strips ALL between-arm
    // covariate imbalance — both arms' adjusted mean collapses to the
    // global 2·mean(x) = 11
    val rows = users.flatMap { u =>
      val x = (u % 10).toInt + 1
      Seq.fill(x)((u, 10L)) ++ Seq.fill(2 * x)((u, 2000L))
    }
    val events = rows.toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Experiment.cupedReadout(events, "user_id", "ts",
      cutoff = timestamp_seconds(lit(1000)), salt = "t").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(6) == 20000L, "theta_pm")          // θ = 2
      assert(r.getLong(7) == 10000L, "var_reduction_pm")  // ρ² = 1
      assert(r.getLong(5) == 110000L, "mean_y_adj_pm")    // 2·mean(x) = 11
    }
    // the RAW means differ across arms (the imbalance CUPED removed)
    assert(out.map(_.getLong(4)).distinct.length == 2)
  }

  test("CUPED keeps single-period users in the frame (x=0 or y=0)") {
    val rows = users.flatMap { u =>
      if (u % 2 == 0) Seq((u, 10L)) else Seq((u, 2000L)) // pre-only / post-only
    } ++ users.map(u => (u, 10L)) // and everyone once pre, so var(X) > 0
    val events = rows.toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Experiment.cupedReadout(events, "user_id", "ts",
      cutoff = timestamp_seconds(lit(1000)), salt = "t").collect()
    assert(out.map(_.getLong(1)).sum == 200L) // every user counted
  }

  test("quantile effects match a sorted-array hand replay at every p") {
    // per-user metric y = (u mod 10) + 1 via y event rows
    val events = users.flatMap(u => Seq.fill((u % 10).toInt + 1)((u, "m")))
      .toDF("user_id", "mtype")
    val ps = Seq((1, 4), (1, 2), (3, 4), (9, 10))
    val out = Experiment.quantileEffects(events, "user_id", ps, salt = "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def typed1(vs: Seq[Long], num: Int, den: Int): Long = {
      val s = vs.sorted
      s(((num * s.size + den - 1) / den) - 1) // ceil rank, 1-based
    }
    val byArm = users.groupBy(arms).map { case (a, us) =>
      a -> us.map(u => (u % 10) + 1L) }
    for ((num, den) <- ps) {
      val (nA, nB, qA, qB) = out(num * 10000L / den)
      assert(nA == byArm(0).size.toLong && nB == byArm(1).size.toLong)
      assert(qA == typed1(byArm(0), num, den), s"q_a at $num/$den")
      assert(qB == typed1(byArm(1), num, den), s"q_b at $num/$den")
    }
  }

  test("DiD isolates the post-period arm effect from a shared level") {
    // everyone: 2 pre events; post: arm 0 keeps 2, arm 1 gets 5
    val events = users.flatMap { u =>
      Seq.fill(2)((u, 10L)) ++
        Seq.fill(if (arms(u) == 1) 5 else 2)((u, 2000L))
    }.toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val Array(r) = Experiment.didReadout(events, "user_id", "ts",
      cutoff = timestamp_seconds(lit(1000)), salt = "t").collect()
    assert(r.getAs[Long]("pre_a_pm") == 20000L)
    assert(r.getAs[Long]("pre_b_pm") == 20000L)
    assert(r.getAs[Long]("post_a_pm") == 20000L)
    assert(r.getAs[Long]("post_b_pm") == 50000L)
    assert(r.getAs[Long]("did_pm") == 30000L)
  }


  test("winsorized readout clamps the whale and leaves everyone else alone") {
    // 99 users with y=2, one whale y=1000; pooled 5%/95% cuts are both 2
    val events = (1L to 99L).flatMap(u => Seq.fill(2)((u, "m"))) ++
      Seq.fill(1000)((100L, "m"))
    val out = Experiment.winsorizedReadout(events.toDF("user_id", "mtype"),
        "user_id", 1, 20, 19, 20, salt = "t")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.values.map(_.getAs[Long]("n_clamped")).sum == 1L)
    out.values.foreach { r =>
      assert(r.getAs[Long]("lo_cut") == 2L && r.getAs[Long]("hi_cut") == 2L)
      assert(r.getAs[Long]("mean_w_pm") == 20000L, "winsorized mean is whale-proof")
    }
    // the raw mean of the whale's arm is badly distorted
    assert(out.values.map(_.getAs[Long]("mean_y_pm")).max > 60000L)
  }


  test("the dossier composes deterministically from the gated operators") {
    // structural twin of q185 on synthetic events: same six checks, and
    // a second run reproduces every value bit-for-bit
    val events = users.flatMap(u =>
      Seq.fill((u % 6).toInt + 1)((u, "m", (u * 1000L))))
      .toDF("user_id", "mtype", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    def run() = {
      val cut = timestamp_seconds(lit(90000))
      val srm = Experiment.srmDaily(events, "user_id", "ts", salt = "t")
        .agg(sum(when(col("srm"), 1L).otherwise(0L)).as("v"))
        .select(lit("srm_flagged_days").as("check"), col("v"))
      val did = Experiment.didReadout(events, "user_id", "ts", cut, salt = "t")
        .select(lit("did_pm").as("check"), col("did_pm").as("v"))
      val qte = Experiment.quantileEffects(events, "user_id", Seq((1, 2)), salt = "t")
        .select(lit("qte_median_effect").as("check"), col("qte").as("v"))
      srm.unionByName(did).unionByName(qte).orderBy("check")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    }
    val a = run()
    assert(a.map(_._1) == Seq("did_pm", "qte_median_effect", "srm_flagged_days"))
    assert(a == run())
  }

  test("SPRT: continue, cross the H0 boundary, and stay sealed") {
    // 25 inactive units/day (1 event each, metric 1 < 3): each day adds
    // 25 * -68993 = -1724825; day 1 continue, day 2 crosses -ln19
    val events = (0 until 3).flatMap { d =>
      (1L to 25L).map(u => (u + d * 100L, d * 86400L))
    }.toDF("user_id", "sec").withColumn("ts", timestamp_seconds(col("sec")))
    val out = Experiment.sprtDaily(events, "user_id", "ts",
        convertedUnit = col("metric_value") >= 3,
        upMicro = 182322L, downMicro = -68993L)
      .collect().map(r => (r.getLong(4), r.getString(5)))
    assert(out(0) == ((-1724825L, "continue")))
    assert(out(1) == ((-3449650L, "accept_h0")))
    assert(out(2)._2 == "accept_h0")
  }

  test("SPRT: an H1 crossing seals the verdict against later reversals") {
    // day 0: 20 converted units (3 events each) -> +3646440 crosses +ln19;
    // days 1-2: heavy unconverted traffic would drive the LLR negative,
    // but the sealed decision must not flip
    val events =
      (1L to 20L).flatMap(u => Seq.fill(3)((u, 0L))) ++
        (0 until 2).flatMap(d => (1L to 60L).map(u => (u + 1000L * (d + 1), (d + 1) * 86400L)))
    val out = Experiment.sprtDaily(events.toDF("user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))),
        "user_id", "ts", convertedUnit = col("metric_value") >= 3,
        upMicro = 182322L, downMicro = -68993L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getString(5)))
    assert(out(0) == ((20L, 20L, 20L * 182322L, "accept_h1")))
    assert(out(2)._3 < -2944439L, "cumulative LLR really did cross the other boundary")
    assert(out.forall(_._4 == "accept_h1"), "first crossing wins and stays")
  }

  test("SRM guard flags a one-arm arrival day and passes a balanced one") {
    val extra = (201L to 500L).toSeq
    val armsX = armsOf(extra, "t")
    val day1 = users.map(u => (u, 0L))                       // balanced-ish
    val day2 = extra.filter(armsX(_) == 0).map(u => (u, 86400L)) // arm-0 only
    val events = (day1 ++ day2).toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Experiment.srmDaily(events, "user_id", "ts", salt = "t")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val (n1a, n1b, srm1) = out("1970-01-01")
    val (n2a, n2b, srm2) = out("1970-01-02")
    // spec replays the integer χ² test against the REAL assignment counts
    assert(srm1 == (10000L * (n1a - n1b) * (n1a - n1b) > 38416L * (n1a + n1b)))
    assert(n2b == 0L && srm2, "a one-arm day must trip the guard")
    // arrival accounting: day-2 users are the extras, none re-counted
    assert(n1a + n1b == 200L && n2a == extra.count(armsX(_) == 0).toLong)
  }

  test("BH step-up: a lower-ranked clearance rescues the ranks above it") {
    import spark.implicits._
    // rank 1 (z2=5e6) misses its 10e6 bar, rank 2 (z2=2e6) clears 1e6:
    // step-up rejects BOTH - the defining BH property
    val z2 = Seq(("m_strong", 5000000L), ("m_weak", 2000000L)).toDF("metric", "z2_ppm")
    val out = Experiment.bhFinish(z2, "metric", Seq(10000000L, 1000000L))
      .collect().map(r => r.getAs[String]("metric") ->
        ((r.getAs[Long]("p_rank"), r.getAs[Boolean]("reject")))).toMap
    assert(out("m_strong") == ((1L, true)))
    assert(out("m_weak") == ((2L, true)))
  }

  test("BH step-up: nothing clears, nothing is rejected") {
    import spark.implicits._
    val z2 = Seq(("a", 5000000L), ("b", 2000000L)).toDF("metric", "z2_ppm")
    val out = Experiment.bhFinish(z2, "metric", Seq(10000000L, 6000000L)).collect()
    assert(out.forall(!_.getAs[Boolean]("reject")))
  }

  test("BH step-up: rejection stops exactly at k_max") {
    import spark.implicits._
    // ranks 1,2 clear; rank 3 does not and nothing below rescues it
    val z2 = Seq(("a", 9000000L), ("b", 5000000L), ("c", 100000L))
      .toDF("metric", "z2_ppm")
    val out = Experiment.bhFinish(z2, "metric",
        Seq(8000000L, 4000000L, 3000000L))
      .collect().map(r => r.getAs[String]("metric") -> r.getAs[Boolean]("reject")).toMap
    assert(out == Map("a" -> true, "b" -> true, "c" -> false))
  }

  test("BH step-up: z2 ties rank deterministically by metric name") {
    import spark.implicits._
    val z2 = Seq(("zz", 5000000L), ("aa", 5000000L)).toDF("metric", "z2_ppm")
    val out = Experiment.bhFinish(z2, "metric", Seq(6000000L, 6000000L))
      .collect().map(r => r.getAs[String]("metric") -> r.getAs[Long]("p_rank")).toMap
    assert(out == Map("aa" -> 1L, "zz" -> 2L))
  }

  test("BH step-up: more metrics than pinned critical values fails loudly") {
    import spark.implicits._
    val z2 = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("metric", "z2_ppm")
    intercept[Exception] {
      Experiment.bhFinish(z2, "metric", Seq(10L, 5L)).collect()
    }
    intercept[IllegalArgumentException] { // crits must be non-increasing
      Experiment.bhFinish(z2, "metric", Seq(1L, 5L, 10L))
    }
  }

  test("bhStepUp end to end: an engineered unanimous effect is rank 1 and rejected") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    // learn the md5 arms first, then give arm-0 users 5 'big' events and
    // arm-1 users 1, so converted(>=5) separates the arms completely
    val users = (1L to 120L)
    val arms = graft.operators.Sampling.withSplitId(
        users.toDF("user_id"), "user_id", Seq(0.5, 0.5), salt = "bh", splitCol = "v")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val events =
      users.flatMap(u => Seq.fill(if (arms(u) == 0) 5 else 1)((u, "big")))
    val out = Experiment.bhStepUp(events.toDF("user_id", "metric"),
        "user_id", "metric", converted = col("metric_value") >= 5,
        critsPpm = Seq(6634897L), salt = "bh")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("p_rank") == 1L && r.getAs[Boolean]("reject"))
    assert(r.getAs[Long]("z2_ppm") > 6634897L)
    // complete separation: every arm-0 user converted, no arm-1 user did
    assert(r.getAs[Long]("c_a") == r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("c_b") == 0L)
  }
}

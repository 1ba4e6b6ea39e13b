package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space LABEL AUDIT (mislabel mining, cleanlab-style): score
  * every vector's cosine against its own label's centroid and against the
  * nearest OTHER label's centroid; a vector closer to a foreign centroid
  * than its own is a mislabel/outlier candidate — the screen a training
  * pipeline runs before trusting labels for supervised fine-tuning or
  * before using label-conditioned sampling weights.
  *
  * ENGINE-EXACT BY CONSTRUCTION (the q61/q70 integer discipline): float
  * sums across rows are order-dependent, so centroids are built from
  * vectors QUANTIZED to integer units (x · 2^20, half-away-from-zero —
  * identical in Spark and DuckDB). Per-label element sums are then exact
  * BIGINTs (order-free), every vector×centroid dot is an exact integer
  * (|xq| ≤ 2^20, |S| ≤ n·2^20 → 64-term dot ≤ 2^57, no overflow), and the
  * only floating point is the final deterministic cast/sqrt/divide — the
  * same IEEE ops in both engines, so the oracle hash-matches doubles.
  *
  * Scale shape (100 TB):
  *   - the centroid build is ONE 64-way posexplode of integer units with
  *     map-side combine — every partition reduces to ≤ labels×dim partial
  *     sums before the (tiny) shuffle;
  *   - the per-label sums (labels × dim longs — KBs) collect to the
  *     driver and return as broadcast LITERALS, so the scoring pass is a
  *     zero-shuffle scan: `labels` codegen'd integer dots per row, no
  *     join, no exchange, no vector duplication;
  *   - output is row-per-vector with a total order on the id.
  */
object EmbedAudit {

  /** Default quantization scale: 2^20 integer units per 1.0. */
  val Scale: Long = 1L << 20

  /** Output: (vec_id, label, own_cos, best_other_label, best_other_cos,
    * is_flagged) ordered by vec_id. Vectors quantizing to all-zero (no
    * direction to compare) are dropped on both engines. */
  def centroidMarginAudit(
      df: DataFrame,
      embCol: String,
      idCol: String,
      labelCol: String
  ): DataFrame = {
    val qv = df.select(
      col(idCol).as("vec_id"),
      col(labelCol).cast("int").as("label"),
      expr(s"transform($embCol, x -> cast(round(cast(x as double) * ${Scale}.0) as bigint))")
        .as("xq"))

    // exact integer per-label element sums — the only shuffle in the op
    val centRows = qv
      .select(col("label"), posexplode(col("xq")).as(Seq("j", "v")))
      .groupBy("label", "j").agg(sum("v").as("s"))
      .collect()
    val cents: Seq[(Int, Array[Long])] = centRows
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (l, rows) =>
        (l, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toArray)
      }
    require(cents.size >= 2, s"label audit needs >= 2 labels, got ${cents.size}")
    // centroid norms on the driver: left-fold of double squares, the
    // exact fold DuckDB's list_reduce replays
    val norms: Map[Int, Double] =
      cents.map { case (l, s) =>
        l -> math.sqrt(s.foldLeft(0.0)((acc, v) => acc + v.toDouble * v.toDouble))
      }.toMap

    def intDot(s: Array[Long]): Column =
      aggregate(
        zip_with(col("xq"), array(s.map(lit).toIndexedSeq: _*), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
    val xn2 = aggregate(zip_with(col("xq"), col("xq"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val xn = sqrt(xn2.cast("double"))

    // one struct per label: (cosine, -label) — array_max picks the best
    // cosine, ties to the LOWER label (the q35 argmax discipline)
    val scored = cents.map { case (l, s) =>
      struct(
        (intDot(s).cast("double") / (xn * lit(norms(l)))).as("c"),
        lit(-l).as("nl"))
    }

    qv.filter(xn2 > 0)
      .withColumn("arr", array(scored: _*))
      .withColumn("own_cos",
        element_at(filter(col("arr"), st => st.getField("nl") === -col("label")), 1)
          .getField("c"))
      .withColumn("best", array_max(filter(col("arr"),
        st => st.getField("nl") =!= -col("label"))))
      .select(col("vec_id"), col("label"),
        col("own_cos"),
        (-col("best.nl")).as("best_other_label"),
        col("best.c").as("best_other_cos"),
        (col("best.c") > col("own_cos")).as("is_flagged"))
      .orderBy("vec_id")
  }

  /** EMBEDDING HEALTH / COLLAPSE PROXY per label: the concentration
    * ratio ‖Σx‖² / (n·Σ‖x‖²) — exactly 1 when every vector points the
    * same way (representation collapse, the classic failed-encoder
    * signature) and ≈ 0 for isotropically spread directions. The
    * first-moment health check that catches a dead embedding column
    * BEFORE it silently breaks every cosine operator downstream
    * (collapsed vectors make everything a near-duplicate).
    *
    * Exactness: coordinates quantize to 2²⁰ integer units (the
    * KMeansQuant scale); per-dim centroid sums, their squared norm, and
    * the total squared mass are all exact integers in DECIMAL(38,0),
    * and the ratio is one truncating per-myriad division. Scale shape:
    * one scan for per-row norms (map-side combined), one posexplode
    * aggregate onto the (label × dim) frame, then label-frame
    * arithmetic. Null/empty vectors are dropped (no direction). */
  def healthReport(
      df: DataFrame,
      embCol: String,
      idCol: String,
      labelCol: String
  ): DataFrame = {
    val scale = 1L << 20
    val big = (c: Column) => c.cast("decimal(38,0)")
    val qv = df.filter(col(idCol).isNotNull && size(col(embCol)) > 0)
      .select(col(labelCol).as("_lab"),
        transform(col(embCol),
          x => round(x.cast("double") * lit(scale.toDouble)).cast("long")).as("_xq"))
      .localCheckpoint(true) // norms pass + centroid pass
    val norms = qv.select(col("_lab"),
        aggregate(col("_xq"), lit(0L), (acc, v) => acc + v * v).as("_n2"))
      .groupBy(col("_lab"))
      .agg(count(lit(1)).as("n"), sum(big(col("_n2"))).cast("decimal(38,0)").as("_mass"))
    val cents = qv
      .select(col("_lab"), posexplode(col("_xq")).as(Seq("_j", "_v")))
      .groupBy(col("_lab"), col("_j")).agg(sum(col("_v")).as("_s"))
      .groupBy(col("_lab"))
      .agg(count(lit(1)).as("dim"),
        sum(big(col("_s")) * big(col("_s"))).cast("decimal(38,0)").as("_cnorm2"))
    norms.join(cents, "_lab")
      .select(col("_lab").as(labelCol), col("n"), col("dim"),
        expr("_mass DIV n").as("avg_norm2_q"),
        when(col("_mass") > 0,
          expr("_cnorm2 * 10000 DIV (n * _mass)")).otherwise(0L)
          .as("collapse_pm"))
      .orderBy(col(labelCol))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REFERENTIAL-INTEGRITY CENSUS over the schema's foreign-key edges —
  * the warehouse-wide "can I trust my joins" audit. An inner join
  * silently DROPS child rows whose parent is missing, so a pipeline that
  * joins first and counts later under-reports without a trace; this
  * audit counts the leakage per edge BEFORE anyone joins: child rows,
  * NULL foreign keys (unjoinable by construction — a different defect
  * from a dangling reference), orphans (non-null fk with no parent), and
  * the joinable coverage in truncating permyriad.
  *
  * Scale shape: per edge, one DISTINCT-parent-key build plus one LEFT
  * ANTI join keyed on the fk — the same shuffle the real join would pay,
  * with only keys as payload; null fks are counted map-side and never
  * shuffle. Edges evaluate independently and union at the end (each is
  * its own job stage-chain — no cross-edge barrier).
  */
object FkAudit {

  /** One (child, fk, parent, pk) edge per entry; output one row per
    * edge, ordered by edge name. */
  def audit(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "FkAudit.audit: at least one FK edge required")
    val per = edges.map { case (name, child, fk, parent, pk) =>
      val keys = child.select(col(fk).as("fk"))
      val nn = keys.filter(col("fk").isNotNull)
      val orphan = nn.join(parent.select(col(pk).as("fk")).distinct(),
        Seq("fk"), "left_anti")
      keys.agg(count(lit(1)).as("n_child"),
          sum(when(col("fk").isNull, 1L).otherwise(0L)).as("n_null_fk"))
        .crossJoin(orphan.agg(count(lit(1)).as("n_orphan")))
        .select(lit(name).as("edge"), col("n_child"), col("n_null_fk"),
          col("n_orphan"))
    }
    per.reduce(_.unionByName(_))
      .withColumn("coverage_pm", expr(
        "CAST(10000 * (n_child - n_null_fk - n_orphan)" +
          " DIV nullif(n_child, 0) AS BIGINT)"))
  }
}

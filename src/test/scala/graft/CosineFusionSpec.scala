package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.{CosineFusion, VectorFunctions}

class CosineFusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // parquet-backed (not a LocalRelation): ConvertToLocalRelation would
  // otherwise constant-fold the whole projection before our rule runs,
  // leaving no plan to inspect
  private lazy val vecs = {
    val dir = java.nio.file.Files.createTempDirectory("cosine_fusion").toString
    Seq(
      (1L, Seq(1f, 2f, 3f, 4f), Seq(4f, 3f, 2f, 1f)),
      (2L, Seq(0.5f, -1f, 2f, 0f), Seq(1f, 1f, 1f, 1f)),
      // ragged pair: the naive form's norms run over FULL arrays
      (3L, Seq(1f, 2f, 3f, 4f), Seq(2f, 1f))
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(s"$dir/vecs")
    spark.read.parquet(s"$dir/vecs")
  }

  private def naive = VectorFunctions.dot($"a", $"b") /
    (VectorFunctions.norm($"a") * VectorFunctions.norm($"b"))

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CosineFusion
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq CosineFusion)
  }

  test("rule rewrites dot/(norm*norm) to the fused one-pass cosine") {
    withRule {
      val df = vecs.select(naive.as("c"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_cosine"), optimized)
      assert(!optimized.contains("graft_norm"), optimized)
      // commuted norm product fuses too
      val commuted = vecs.select((VectorFunctions.dot($"a", $"b") /
        (VectorFunctions.norm($"b") * VectorFunctions.norm($"a"))).as("c"))
      assert(commuted.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
      // different argument sets must NOT fuse (that's not a cosine)
      val notCosine = vecs.select((VectorFunctions.dot($"a", $"b") /
        (VectorFunctions.norm($"a") * VectorFunctions.norm($"a"))).as("c"))
      assert(!notCosine.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    }
  }

  test("fused results are bit-equal to the naive form, ragged arrays included") {
    val unfused = vecs.select($"id", naive.as("c")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fused = withRule {
      vecs.select($"id", naive.as("c")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val direct = vecs.select($"id", VectorFunctions.cosine($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused == unfused)  // the rewrite changed the plan, not the answer
    assert(direct == unfused) // and the fused expression IS the naive semantics
  }
}

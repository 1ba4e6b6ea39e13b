package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: fuse the naive cosine formulation
  *
  *   dot(a, b) / (norm(a) * norm(b))
  *
  * into the one-pass [[CosineSimilarity]] expression. The naive form
  * traverses each array twice (dot over the pair + a norm per side);
  * the fused form traverses each exactly once — on a 100 TB scoring
  * scan that halves the memory bandwidth of the hottest loop, which is
  * the entire cost of a brute-force similarity pass.
  *
  * Semantics-preserving BY CONSTRUCTION, not approximately:
  * [[CosineSimilarity]] computes the dot over the common prefix and
  * each norm over its full array in the same index order as the
  * unfused expressions, so the rewrite is bit-equal on every input,
  * ragged arrays included (VectorExpressionsSpec pins this). The rule
  * fires on both operand orders of the norm product and uses semantic
  * equality, so aliased/cosmetically-different subtrees still match;
  * it deliberately does NOT fire when the norm arguments aren't the
  * dot's arguments — that expression is not a cosine.
  *
  * Registered by [[GraftExtensions]] (`injectOptimizerRule`) for
  * builder-time sessions, or session-locally via
  * `spark.experimental.extraOptimizations :+= CosineFusion`.
  */
object CosineFusion extends Rule[LogicalPlan] {

  private def sameArgs(a: Expression, b: Expression, x: Expression, y: Expression): Boolean =
    (a.semanticEquals(x) && b.semanticEquals(y)) ||
      (a.semanticEquals(y) && b.semanticEquals(x))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotProduct(a, b), Multiply(L2Norm(x), L2Norm(y), _), _)
          if sameArgs(a, b, x, y) =>
        CosineSimilarity(a, b)
    }
}

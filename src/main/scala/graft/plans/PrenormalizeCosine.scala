package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.DoubleType

import graft.functions.{CosineDistance, CosineDistanceKnownNorm, CosineSimilarity, VectorOps}

/** Optimization-only rewrite (SURVEY §4.3): a cosine distance whose
  * query side is foldable — the `ORDER BY cosine_distance(embedding,
  * &lt;literal probe&gt;) LIMIT k` store-query shape — folds the
  * probe's NORM at plan time: each scanned row then accumulates only
  * the dot product and its own norm (a third fewer flops on the
  * 100 TB side).
  *
  * Bit-identical by construction: the probe child passes through
  * unchanged and [[VectorOps.norm]] folds `sqrt(Σ y²)` with exactly
  * the accumulation order [[VectorOps.cosineDistance]] uses, so
  * `sqrt(nx) * sqrtNy` reproduces the original `sqrt(nx) * sqrt(ny)`
  * to the last ulp — conformance hashes cannot drift when the rule
  * fires. A null probe is left untouched; a zero-norm probe folds to
  * denom 0 and keeps the degenerate distance-1.0 contract.
  */
object PrenormalizeCosine extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e @ CosineDistance(x, q) if q.foldable && !x.foldable =>
        foldedNorm(q).map(CosineDistanceKnownNorm(x, q, _)).getOrElse(e)
      case e @ CosineDistance(q, x) if q.foldable && !x.foldable =>
        // cosine is symmetric — fold whichever side is constant
        foldedNorm(q).map(CosineDistanceKnownNorm(x, q, _)).getOrElse(e)
      case e @ CosineSimilarity(x, q) if q.foldable && !x.foldable =>
        foldedNorm(q).map(n =>
          Subtract(Literal(1.0), CosineDistanceKnownNorm(x, q, n))).getOrElse(e)
      case e @ CosineSimilarity(q, x) if q.foldable && !x.foldable =>
        foldedNorm(q).map(n =>
          Subtract(Literal(1.0), CosineDistanceKnownNorm(x, q, n))).getOrElse(e)
    }

  /** Evaluate the foldable probe's norm; None for null/non-array. */
  private def foldedNorm(q: Expression): Option[Expression] =
    q.eval() match {
      case a: ArrayData => Some(Literal(VectorOps.norm(a), DoubleType))
      case _ => None
    }
}

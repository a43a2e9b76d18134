package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CosineDistance, CosineDistancePrenorm, CosineSimilarity}

/** Optimization-only rewrite (SURVEY §4.3): a cosine distance whose
  * query side is foldable — the `ORDER BY cosine_distance(embedding,
  * &lt;literal probe&gt;) LIMIT k` store-query shape — folds the
  * probe's normalization INTO the plan. The probe is evaluated once at
  * optimization time, divided by its norm, and embedded as an
  * ARRAY&lt;DOUBLE&gt; literal; each scanned row then accumulates only
  * the dot product and its own norm (one third fewer flops on the
  * 100 TB side, and the probe norm is no longer recomputed per row).
  *
  * Semantics-preserving: double accumulation as before; a zero-norm or
  * null probe is left untouched (the original expression's degenerate
  * contract — distance 1.0 — applies). Purely additive: plans without
  * a foldable side (e.g. the b2/b3 conformance queries, which join
  * the probe from a table) are unchanged.
  */
object PrenormalizeCosine extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e @ CosineDistance(x, q) if q.foldable && !x.foldable =>
        prenormalized(q).map(CosineDistancePrenorm(x, _)).getOrElse(e)
      case e @ CosineDistance(q, x) if q.foldable && !x.foldable =>
        // cosine is symmetric — normalize whichever side is constant
        prenormalized(q).map(CosineDistancePrenorm(x, _)).getOrElse(e)
      case e @ CosineSimilarity(x, q) if q.foldable && !x.foldable =>
        prenormalized(q).map(p =>
          Subtract(Literal(1.0), CosineDistancePrenorm(x, p))).getOrElse(e)
      case e @ CosineSimilarity(q, x) if q.foldable && !x.foldable =>
        prenormalized(q).map(p =>
          Subtract(Literal(1.0), CosineDistancePrenorm(x, p))).getOrElse(e)
    }

  /** Evaluate the foldable probe and return it unit-normalized as an
    * ARRAY&lt;DOUBLE&gt; literal; None when null/empty/zero-norm.
    */
  private def prenormalized(q: Expression): Option[Expression] =
    q.eval() match {
      case a: ArrayData if a.numElements() > 0 =>
        val n = a.numElements()
        val ds = new Array[Double](n)
        var s = 0.0
        var i = 0
        while (i < n) {
          val v = a.getFloat(i).toDouble
          ds(i) = v; s += v * v
          i += 1
        }
        val norm = math.sqrt(s)
        if (norm == 0.0) None
        else {
          var j = 0
          while (j < n) { ds(j) /= norm; j += 1 }
          Some(Literal(new GenericArrayData(ds),
            ArrayType(DoubleType, containsNull = false)))
        }
      case _ => None
    }
}

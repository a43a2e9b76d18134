package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType}

/** Catalyst expressions for the vector-distance family (SURVEY §2 B1).
  *
  * Null-safe, dimension-checked, codegen'd: `doGenCode` emits a direct
  * static call into [[VectorOps]], so these stay inside whole-stage
  * codegen (no UDF/serialization overhead in the hot top-k path).
  *
  * Reference semantics source: the Cosmos embedding policy declares
  * cosine/float32 (AzureCosmosDB/.../CosmosDBClientWrapper.cs:135-144)
  * and the store query shape is `ORDER BY VectorDistance(...)` (README
  * AzureCosmosDB/csharp/README.md:104-106).
  */
abstract class BinaryVectorExpression extends BinaryExpression with ExpectsInputTypes {
  // note: inferred type — AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Name of the VectorOps method implementing this expression. */
  protected def opName: String

  override def nullSafeEval(a: Any, b: Any): Any = evalVec(
    a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected def evalVec(x: ArrayData, y: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarders on the object's mirror class keep the generated
    // code a plain static call (stays inside whole-stage codegen)
    val ops = VectorOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ops.$opName($a, $b);")
  }
}

case class CosineDistance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "cosine_distance"
  override protected def opName: String = "cosineDistance"
  override protected def evalVec(x: ArrayData, y: ArrayData): Double =
    VectorOps.cosineDistance(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** [[CosineDistance]] with the query side's norm folded at plan time —
  * produced only by the [[graft.plans.PrenormalizeCosine]] optimizer
  * rule. The query vector child stays UNCHANGED (same floats, same
  * accumulation), so results are bit-identical to [[CosineDistance]];
  * only the per-row ny accumulation is skipped.
  */
case class CosineDistanceKnownNorm(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def prettyName: String = "cosine_distance_known_norm"
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType), DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VectorOps.cosineDistanceKnownNorm(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = VectorOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (a, b, c) => s"${ev.value} = $ops.cosineDistanceKnownNorm($a, $b, $c);")
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
}

/** [[CosineDistance]] with BOTH norms supplied — the stored-norm read
  * path: `third` is a per-row norm column materialized at write time
  * (`vector_norm(embedding)`), `fourth` the probe's norm (foldable —
  * `vector_norm(<literal probe>)` constant-folds at plan time). The
  * scan then does only the dot product per row. Bit-identical to
  * [[CosineDistance]] when the norms come from [[VectorNorm]] (see
  * [[VectorOps.cosineDistanceStoredNorm]]).
  */
case class CosineDistanceStoredNorm(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def prettyName: String = "cosine_distance_stored_norm"
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType), DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    VectorOps.cosineDistanceStoredNorm(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = VectorOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (a, b, c, d) => s"${ev.value} = $ops.cosineDistanceStoredNorm($a, $b, $c, $d);")
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression) =
    copy(first = a, second = b, third = c, fourth = d)
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def opName: String = "cosineSimilarity"
  override protected def evalVec(x: ArrayData, y: ArrayData): Double =
    VectorOps.cosineSimilarity(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "dot_product"
  override protected def opName: String = "dot"
  override protected def evalVec(x: ArrayData, y: ArrayData): Double =
    VectorOps.dot(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class L2Distance(left: Expression, right: Expression)
    extends BinaryVectorExpression {
  override def prettyName: String = "l2_distance"
  override protected def opName: String = "l2Distance"
  override protected def evalVec(x: ArrayData, y: ArrayData): Double =
    VectorOps.l2Distance(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Packs int codes 0..255 into a BinaryType column (D8 storage form:
  * one byte per element, 4× smaller than the float vector).
  */
case class Int8Pack(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "int8_pack"
  override def inputTypes = Seq(ArrayType(IntegerType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    VectorOps.packInt8(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = VectorOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ops.packInt8($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Asymmetric quantized cosine distance over packed int8 codes —
  * `q8_cosine_distance(codes, mn, scale, query)`; algebraically the
  * cosine distance of the dequantized vector against the float query,
  * computed in one codegen'd pass over the bytes.
  */
case class Q8CosineDistance(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def prettyName: String = "q8_cosine_distance"
  override def inputTypes =
    Seq(BinaryType, DoubleType, DoubleType, ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    VectorOps.q8CosineDistance(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Double], c.asInstanceOf[Double],
      d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = VectorOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (a, b, c, d) => s"${ev.value} = $ops.q8CosineDistance($a, $b, $c, $d);")
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression) =
    copy(first = a, second = b, third = c, fourth = d)
}

case class VectorNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "vector_norm"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    VectorOps.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = VectorOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ops.norm($a);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Tight dot-product kernels over Catalyst array data. One JIT-compiled
  * loop; no per-element lambda interpretation. Accumulation is
  * left-to-right in double — bit-identical to the
  * `zip_with`/`aggregate` fold and to the oracle's `list_reduce`.
  *
  * NULL semantics also mirror the fold exactly (so the optimizer rewrite
  * is sound for every input): `zip_with` pads the shorter array with
  * nulls and `null * x` poisons the sum, so unequal lengths or any null
  * element yield SQL NULL (returned here as a null boxed Double). */
object ArrayDotUtil {
  def dotFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotDouble(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** `array_dot(a, b)`: double dot product of two float[] or double[]
  * columns (SURVEY training-data extensions — similarity search).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate
  * their lambdas interpretively per element; on an all-pairs similarity
  * join that is millions of interpreted closures. This expression is one
  * static call — measured ~20× faster on the embedding near-dup query.
  * Registered via [[graft.GraftExtensions]].
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot requires two array<float> or two array<double> arguments, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (elemType == FloatType) ArrayDotUtil.dotFloat(a, b)
    else ArrayDotUtil.dotDouble(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (elemType == FloatType) "dotFloat" else "dotDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotResult")
      s"""java.lang.Double $tmp = graft.plans.ArrayDotUtil.$fn($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDot].getName, "array_dot")
}

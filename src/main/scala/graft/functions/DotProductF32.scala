package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Native codegen'd float32 dot product: `sum_i a[i]*b[i]` with every
  * product computed in double, accumulated sequentially left-to-right.
  *
  * Why a custom Catalyst Expression (SURVEY §2.10 preference order): the
  * composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — runs
  * INTERPRETED (higher-order functions have no codegen) and allocates an
  * intermediate 64-element array per pair; on the ANN/near-dup hot paths
  * that is millions of interpreted lambda invocations. This expression
  * generates a tight primitive loop inside whole-stage codegen.
  *
  * Result is BIT-IDENTICAL to the higher-order form (same IEEE multiply/
  * add sequence, same 0.0 seed) INCLUDING the degenerate cases (ADVICE r2):
  * a length mismatch is NULL (zip_with pads the short side with null, the
  * null product nulls the fold) and a null element is NULL — never a
  * silent truncate-and-zero-fill. DotProductSpec pins both against the
  * higher-order form.
  */
case class DotProductF32(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f32 requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // Nullable even for non-null inputs: mismatch/null-element -> null.
  override def nullable: Boolean = true

  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductF32.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

object DotProductF32 {
  /** Shared by interpreted eval and tests; null on length mismatch or a
    * null element (the higher-order form's exact semantics). */
  def compute(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

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
  * add sequence, same 0.0 seed), so the DuckDB oracle twins
  * (`list_reduce` mirror) hold unchanged.
  *
  * Nulls: a null array yields null (nullSafeEval); null ELEMENTS are not
  * expected (embedding vectors are dense) — they read as 0.0f per
  * ArrayData.getFloat semantics rather than nulling the result.
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

  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

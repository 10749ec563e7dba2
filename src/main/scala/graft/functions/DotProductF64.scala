package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd float64 dot product — [[DotProductF32]]'s twin for
  * DOUBLE arrays (random-projection space, where coordinates are already
  * double and a float cast would lose the JL guarantee). Same sequential
  * left-to-right accumulation, same degenerate semantics (length mismatch
  * or null element → NULL), bit-identical to the higher-order
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form it replaces on the
  * q126 pair loop (DotProductSpec pins it). */
case class DotProductF64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f64 requires (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // Nullable even for non-null inputs: mismatch/null-element -> null.
  override def nullable: Boolean = true

  override def prettyName: String = "dot_f64"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductF64.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

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
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF64 =
    copy(left = newLeft, right = newRight)
}

object DotProductF64 {
  /** Shared by interpreted eval and tests; null on length mismatch or a
    * null element (the higher-order form's exact semantics). */
  def compute(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, FloatType,
  LongType}

/** Symmetric int8 scalar quantization of a float32 vector: per-vector
  * scale = max|x| / 127, code_j = trunc(x_j * 127 / max|x|) ∈ [-127, 127].
  *
  * THE memory/bandwidth lever for a 100 TB embedding store: int8 codes are
  * 4× smaller than float32, so 4× more vectors per executor page, 4× less
  * shuffle per candidate join, and the scoring loop is integer multiplies.
  * The standard serving pattern (FAISS `SQ8`): quantize ONCE at ingest
  * (map-side, this expression), store codes + scale, score with
  * [[I8Dot]], re-rank the short list with exact float cosine if needed.
  *
  * Truncation (toward zero) rather than rounding is deliberate: Java's
  * `(int)` cast and DuckDB's `trunc()` agree exactly on every double, so
  * the oracle twins bit-for-bit without replaying half-even decimal
  * rounding on binary doubles. The recall cost of trunc-vs-round is a
  * fraction of the int8 noise floor itself.
  *
  * Degenerate inputs follow [[DotProductF32]]'s conventions: NULL vector →
  * null; a null ELEMENT → null (never silently zero-filled). The all-zero
  * vector quantizes to all-zero codes (no 0/0). */
case class I8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"i8_quantize requires array<float>, got $t")
    }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "i8_quantize"

  override protected def nullSafeEval(input: Any): Any =
    I8Quant.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
       |${ev.value} = graft.functions.I8Quant.quantize($v);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): I8Quantize = copy(child = newChild)
}

/** Integer dot product of two int8 code vectors (as produced by
  * [[I8Quantize]]): Σ a_j·b_j as a long — exact, tie-stable, and the hot
  * scoring loop is 64 integer multiply-adds with no FP at all. Length
  * mismatch → null (the [[DotProductF32]] convention). */
case class I8Dot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"i8_dot requires (array<tinyint>, array<tinyint>), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "i8_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    I8Quant.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // Primitive fast path (ADVICE r5): null is only possible on a length
    // mismatch, so the check is inlined and the matched-length case calls
    // a long-returning loop — no boxed Long allocation per scored pair on
    // the hot int8 scoring loop this class exists to optimize.
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
       |else { ${ev.value} = graft.functions.I8Quant.dotLong($a, $b); }
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): I8Dot =
    copy(left = newLeft, right = newRight)
}

object I8Quant {
  /** Shared by interpreted eval, codegen, and specs. Null on a null OR
    * non-finite element (NaN/±Inf have no meaningful int8 code, and the
    * composable ANSI form would throw on the NaN→long cast — null keeps
    * the degenerate row out of the bucketed join instead of killing the
    * job or silently zero-coding it); all-zero input → all-zero codes. */
  def quantize(v: ArrayData): GenericArrayData = {
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = v.getFloat(i)
      if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x))
        return null
      val a = math.abs(x.toDouble)
      if (a > amax) amax = a
      i += 1
    }
    val codes = new Array[Byte](n)
    if (amax > 0) {
      i = 0
      while (i < n) {
        // (byte)(double) truncates toward zero — DuckDB trunc()'s twin;
        // |x|*127/amax <= 127 so the cast cannot overflow.
        codes(i) = (v.getFloat(i).toDouble * 127.0 / amax).toByte
        i += 1
      }
    }
    new GenericArrayData(codes)
  }

  /** Boxed form for interpreted eval (null on length mismatch). */
  def dot(a: ArrayData, b: ArrayData): Any = {
    if (a.numElements() != b.numElements()) return null
    java.lang.Long.valueOf(dotLong(a, b))
  }

  /** Primitive hot loop — PRECONDITION: equal lengths (codegen checks
    * inline and routes mismatches to null without calling this). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getByte(i).toLong * b.getByte(i)
      i += 1
    }
    acc
  }
}

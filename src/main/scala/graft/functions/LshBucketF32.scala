package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane LSH bucket id for a 64-dim float32 vector:
  * `planes` sign bits of deterministic-LCG hyperplane projections packed
  * into a long — the bucket-assignment pass that touches EVERY corpus
  * vector on the ANN scale path.
  *
  * The composable form ([[graft.operators.VectorOps.lshBucketHof]]) runs
  * one interpreted `aggregate(zip_with(...))` fold PER PLANE per vector;
  * this expression computes all planes in one tight generated loop with
  * the identical IEEE sequence (products in double, sequential
  * left-to-right fold from 0.0, same `w(p,j) = ((1103515245*(p*64+j) +
  * 12345) % 1000) - 500` integer weights, bit set iff proj > 0).
  *
  * Degenerate cases: a vector whose length is not 64, with a null
  * element, or NULL outright gets bucket 0 — exactly the composable
  * form's semantics (every projection nulls out and `when(null > 0)`
  * falls through). Mirroring NULL→0 (rather than returning null) keeps
  * kernel, composable form, and the DuckDB oracle's CASE expression
  * bit-identical on EVERY input, so oracle equality for q28/q49/q53
  * no longer depends on the corpus never containing a null vector
  * (ADVICE r4). The expression is therefore non-nullable. */
case class LshBucketF32(child: Expression, planes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"lsh_bucket_f32 requires array<float>, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_bucket_f32"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshBucketF32.compute(v.asInstanceOf[ArrayData], planes)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |long ${ev.value} = ${childGen.isNull} ? 0L :
        |  graft.functions.LshBucketF32.compute(${childGen.value}, $planes);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshBucketF32 = copy(child = newChild)
}

object LshBucketF32 {
  val Dims = 64

  def compute(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    if (n != Dims) return 0L // composable form: every projection nulls out
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return 0L; i += 1 }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var j = 1
      while (j <= Dims) {
        val w = ((1103515245L * (p * 64L + j) + 12345L) % 1000L - 500L)
          .toDouble
        acc += v.getFloat(j - 1).toDouble * w
        j += 1
      }
      if (acc > 0) bucket += 1L << p
      p += 1
    }
    bucket
  }
}

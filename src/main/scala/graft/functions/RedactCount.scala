package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused redaction: one regex traversal yields BOTH the match count and
  * the redacted string as struct<n:int, s:string>. Equals
  * `(size(regexp_extract_all(c, p, 0)), regexp_replace(c, p, token))` —
  * the PII-scrub hot path (q42) previously paid two full traversals per
  * pattern plus a match-array allocation just to count; at corpus scale
  * the regex walk IS the query cost, so halving traversals halves the
  * bill. The pattern is a compile-time literal, compiled once per
  * expression instance and shared via a codegen reference object —
  * never per row. Matches are non-overlapping `find()` order, identical
  * to both fused-away forms; the replacement token is inserted verbatim
  * (no `$` group expansion, unlike raw appendReplacement). */
case class RedactCount(child: Expression, pattern: String, token: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("s", StringType, nullable = false)))
  override def prettyName: String = "redact_count"

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)
  @transient private lazy val tokenStr: String = token

  override protected def nullSafeEval(input: Any): Any =
    RedactCount.compute(input.asInstanceOf[UTF8String], compiled, tokenStr)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pattern", compiled,
      classOf[Pattern].getName)
    val t = ctx.addReferenceObj("token", tokenStr, classOf[String].getName)
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.RedactCount.compute($in, $p, $t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RedactCount = copy(child = newChild)
}

object RedactCount {
  def compute(s: UTF8String, p: Pattern, token: String): InternalRow = {
    val str = s.toString
    val m = p.matcher(str)
    var n = 0
    var last = 0
    val sb = new java.lang.StringBuilder(str.length)
    while (m.find()) {
      n += 1
      sb.append(str, last, m.start()).append(token)
      last = m.end()
    }
    sb.append(str, last, str.length)
    new GenericInternalRow(
      Array[Any](n, UTF8String.fromString(sb.toString)))
  }
}

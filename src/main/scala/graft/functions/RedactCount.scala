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
  /** The two hot-path patterns get HAND-ROLLED LINEAR BYTE SCANNERS
    * (r17): the corpus-scale PII scrub (q42) runs both over every doc,
    * and `java.util.regex` pays a UTF-16 `toString` of each row plus
    * per-char NFA stepping for what are fixed three-state token shapes.
    * The scanners walk the UTF-8 bytes directly (all pattern chars are
    * ASCII, and UTF-8 continuation bytes never collide with ASCII
    * classes, so byte-level spans equal char-level spans) and are
    * match-for-match identical to `Pattern.find()` semantics —
    * earliest-start, greedy, non-overlapping (property-spec-pinned
    * against the regex path on adversarial inputs, and the q42 oracle
    * hashes the redacted STRING, so any divergence fails the gate).
    * Every other pattern takes the regex path unchanged. */
  private val NumberSrc = "[0-9]+"
  private val EmailSrc = "[a-z0-9]+@[a-z]+\\.[a-z]+"

  def compute(s: UTF8String, p: Pattern, token: String): InternalRow =
    p.pattern() match {
      case NumberSrc => computeNumber(s, token)
      case EmailSrc  => computeEmail(s, token)
      case _         => computeRegex(s, p, token)
    }

  private def computeRegex(s: UTF8String, p: Pattern,
                           token: String): InternalRow = {
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

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isLower(b: Byte): Boolean = b >= 'a' && b <= 'z'
  @inline private def isAlnum(b: Byte): Boolean = isDigit(b) || isLower(b)

  /** Byte-building sink shared by the scanners: input bytes copied in
    * match-free slices, the token's UTF-8 bytes inserted per match. */
  private final class Sink(cap: Int, token: String) {
    private val tok = token.getBytes("UTF-8")
    private var buf = new Array[Byte](cap)
    private var len = 0
    private def ensure(extra: Int): Unit =
      if (len + extra > buf.length)
        buf = java.util.Arrays.copyOf(buf,
          math.max(buf.length * 2, len + extra))
    def slice(src: Array[Byte], from: Int, until: Int): Unit = {
      val m = until - from
      if (m > 0) { ensure(m); System.arraycopy(src, from, buf, len, m)
        len += m }
    }
    def mark(): Unit = { ensure(tok.length)
      System.arraycopy(tok, 0, buf, len, tok.length); len += tok.length }
    def result(n: Int): InternalRow = new GenericInternalRow(
      Array[Any](n, UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))))
  }

  /** `[0-9]+` — maximal digit runs, exactly `find()`'s greedy
    * non-overlapping walk. */
  private def computeNumber(s: UTF8String, token: String): InternalRow = {
    val b = s.getBytes
    val out = new Sink(b.length + 16, token)
    var n = 0
    var last = 0
    var i = 0
    while (i < b.length) {
      if (isDigit(b(i))) {
        val start = i
        while (i < b.length && isDigit(b(i))) i += 1
        out.slice(b, last, start); out.mark(); last = i; n += 1
      } else i += 1
    }
    out.slice(b, last, b.length)
    out.result(n)
  }

  /** `[a-z0-9]+@[a-z]+\.[a-z]+` — for each '@' preceded by a non-empty
    * alnum run, greedily parse `[a-z]+ '.' [a-z]+`; the match starts at
    * the run's start (the earliest position the leading greedy class
    * can match from, which is what `find()` returns) and scanning
    * resumes at the match end. A failed suffix resumes AFTER the '@'
    * (no earlier start can succeed: every start inside the run reaches
    * the same '@' and the same failing suffix). */
  private def computeEmail(s: UTF8String, token: String): InternalRow = {
    val b = s.getBytes
    val out = new Sink(b.length + 16, token)
    var n = 0
    var last = 0
    var i = 0
    var runStart = -1
    while (i < b.length) {
      val c = b(i)
      if (isAlnum(c)) {
        if (runStart < 0) runStart = i
        i += 1
      } else if (c == '@' && runStart >= 0) {
        // greedy [a-z]+ then '.' then greedy [a-z]+
        var j = i + 1
        while (j < b.length && isLower(b(j))) j += 1
        if (j > i + 1 && j < b.length && b(j) == '.') {
          var e = j + 1
          while (e < b.length && isLower(b(e))) e += 1
          if (e > j + 1) {
            out.slice(b, last, runStart); out.mark(); last = e; n += 1
            i = e; runStart = -1
          } else { i += 1; runStart = -1 }
        } else { i += 1; runStart = -1 }
      } else { i += 1; runStart = -1 }
    }
    out.slice(b, last, b.length)
    out.result(n)
  }
}

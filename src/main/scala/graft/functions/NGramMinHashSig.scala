package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FUSED shingle + MinHash signature: text in, all K permutation minima
  * out, with no intermediate shingle array ever materialized.
  *
  * The composable pipeline (`minhash_sig(charShinglesMulti(text, n))`)
  * pays an INTERPRETED higher-order `transform` per row — one substr
  * UTF8String allocation per shingle position, an array to hold them, and
  * a lambda-eval loop Catalyst cannot codegen. This expression walks the
  * text's UTF-8 bytes once and streams each window straight into the md5
  * digest (`update(bytes, start, len)`), so the per-shingle cost is the
  * digest itself.
  *
  * Bit-identical to the composable form by construction:
  *  - char mode: windows are `n` CODE POINTS (UTF-8 lead-byte walk — the
  *    same code-point semantics as Spark `substring`); texts shorter than
  *    `n` hash the whole text (charShingles' fallback);
  *  - word mode: tokens are the text split on every single 0x20 byte
  *    (exactly `split(text, " ")` with trailing empties kept), each
  *    window's digest fed token bytes joined by a space byte — md5 of the
  *    identical `concat_ws(" ", slice(...))` string; fewer than `n`
  *    tokens → null (wordShingles' empty-set fallback → doc dropped).
  * Duplicate windows need no dedup: a min over duplicates equals the min
  * over the distinct set. The DuckDB oracle (min over unnest + md5
  * prefix of the DISTINCT shingle list) is unchanged for the same reason.
  * Equality with the composable form is pinned in specs over adversarial
  * inputs (multi-space, unicode, short, empty).
  */
case class NGramMinHashSig(child: Expression, n: Int, word: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String =
    if (word) "word_minhash_sig" else "char_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    NGramMinHashSig.compute(input.asInstanceOf[UTF8String], n, word)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val out = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.NGramMinHashSig.compute($t, $n, $word);
         |if ($out == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NGramMinHashSig = copy(child = newChild)
}

object NGramMinHashSig {
  import MinHashSig.{K, P, aCoef, bCoef}
  private val A: Array[Long] = Array.tabulate(K)(aCoef)
  private val B: Array[Long] = Array.tabulate(K)(bCoef)
  private val Space: Array[Byte] = Array(' '.toByte)

  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(
      () => java.security.MessageDigest.getInstance("MD5"))

  /** Static entry shared by generated and interpreted eval. */
  def compute(text: UTF8String, n: Int, word: Boolean): ArrayData = {
    val mins = Array.fill(K)(Long.MaxValue)
    val any = foreachWindowHash(text.getBytes, n, word) { h =>
      var k = 0
      while (k < K) {
        val v = (A(k) * h + B(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** Walk every shingle window of `bytes` and feed its 32-bit md5-prefix
    * hash to `f`. Returns false when the input yields NO windows (word
    * mode with fewer than n tokens — the composable empty-set fallback);
    * char mode always yields at least the whole-text window.
    * Shared by the minhash and hash-set kernels so window semantics
    * cannot drift between them. */
  private[functions] def foreachWindowHash(bytes: Array[Byte], n: Int,
                                           word: Boolean)
                                          (f: Long => Unit): Boolean = {
    val md = digest.get()
    val buf = new Array[Byte](16)
    def emit(): Unit = {
      md.digest(buf, 0, 16)
      f(((buf(0) & 0xffL) << 24) | ((buf(1) & 0xffL) << 16) |
        ((buf(2) & 0xffL) << 8) | (buf(3) & 0xffL))
    }
    if (word) {
      // Token ranges: split on every single 0x20 (trailing empties kept,
      // exactly like split(text, " ") with its default -1 limit).
      var nTokens = 1
      var i = 0
      while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
      if (nTokens < n) return false // wordShingles: fewer than n tokens
      val starts = new Array[Int](nTokens + 1)
      var t = 1
      i = 0
      while (i < bytes.length) {
        if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
        i += 1
      }
      starts(nTokens) = bytes.length + 1 // virtual separator past the end
      var w = 0
      while (w <= nTokens - n) {
        md.reset()
        var j = w
        while (j < w + n) {
          md.update(bytes, starts(j), (starts(j + 1) - 1) - starts(j))
          if (j < w + n - 1) md.update(Space, 0, 1)
          j += 1
        }
        emit()
        w += 1
      }
    } else {
      // Code-point start offsets (UTF-8 lead-byte walk), one sentinel end.
      val offs = new Array[Int](bytes.length + 1)
      var nChars = 0
      var i = 0
      while (i < bytes.length) {
        if ((bytes(i) & 0xc0) != 0x80) { offs(nChars) = i; nChars += 1 }
        i += 1
      }
      offs(nChars) = bytes.length
      if (nChars < n) {
        // whole-text fallback (includes the empty string)
        md.reset(); md.update(bytes, 0, bytes.length); emit()
      } else {
        var w = 0
        while (w <= nChars - n) {
          md.reset(); md.update(bytes, offs(w), offs(w + n) - offs(w)); emit()
          w += 1
        }
      }
    }
    true
  }
}

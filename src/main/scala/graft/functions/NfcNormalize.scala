package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * codegen'd expression — Spark has no built-in for it, yet a real text
  * pipeline MUST canonicalize before hashing: "é" composed (U+00E9) and
  * decomposed (U+0065 U+0301) are byte-different, so every dedup hash,
  * shingle, fingerprint, and equality join silently treats equal-looking
  * documents as distinct until the corpus is normalized.
  *
  * Backed by the JDK's `java.text.Normalizer` (the Unicode reference
  * algorithm; DuckDB's `nfc_normalize` — utf8proc — implements the same
  * UAX #15, which is what lets the oracle twin bit-for-bit). The common
  * all-ASCII case is detected with a byte scan and returns the input
  * UTF8String unchanged — no String round-trip on the hot path. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires string, got $t")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($v);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC is the identity on ASCII, and most corpus
    // bytes are ASCII — skip the UTF-16 round-trip entirely. Scanned via
    // getByte (offset-addressed), NOT getBytes: for UnsafeRow-backed
    // strings getBytes would copy numBytes per row just to look at them.
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle hash-SET: text in, SORTED distinct array of 32-bit
  * md5-prefix window hashes out — the verify-stage sibling of
  * [[NGramMinHashSig]] (same window walk, shared via
  * `foreachWindowHash`, so the two kernels cannot disagree on shingle
  * semantics). Equals `array_distinct(transform(shingles, hash32))` as a
  * SET; the sort is the extra contract that lets [[SortedIntersectCount]]
  * merge two of these in O(n+m) without building a hash table per pair.
  * Null for word-mode texts with fewer than n tokens (empty shingle set). */
case class NGramHashSet(child: Expression, n: Int, word: Boolean)
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
    if (word) "word_shingle_hashset" else "char_shingle_hashset"

  override protected def nullSafeEval(input: Any): Any =
    NGramHashSet.compute(input.asInstanceOf[UTF8String], n, word)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val out = ctx.freshName("hs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.NGramHashSet.compute($t, $n, $word);
         |if ($out == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NGramHashSet = copy(child = newChild)
}

object NGramHashSet {
  /** Collect all window hashes, sort, dedupe in place. */
  def compute(text: UTF8String, n: Int, word: Boolean): ArrayData = {
    val bytes = text.getBytes
    var arr = new Array[Long](math.max(8, bytes.length + 1))
    var m = 0
    val any = NGramMinHashSig.foreachWindowHash(bytes, n, word) { h =>
      if (m == arr.length) arr = java.util.Arrays.copyOf(arr, m * 2)
      arr(m) = h
      m += 1
    }
    if (!any) return null
    java.util.Arrays.sort(arr, 0, m)
    var out = 0
    var i = 0
    while (i < m) {
      if (out == 0 || arr(i) != arr(out - 1)) { arr(out) = arr(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, out))
  }
}

/** |A ∩ B| of two SORTED distinct long arrays by linear merge — no hash
  * table per pair, no boxing. The verify stage's inner loop: with
  * candidate docs carrying [[NGramHashSet]] arrays, Jaccard =
  * inter / (|A| + |B| - inter). Inputs MUST be sorted distinct (the
  * producing kernel guarantees it); nulls propagate. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ($l, $r)")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Fused winnowing-style fingerprint: the MINIMUM 32-bit window hash —
  * `array_min(transform(windows, hash32))` with no window array and no
  * interpreted lambda (the q23 fingerprint pass runs over EVERY doc at
  * corpus scale). Char mode with n=width equals
  * [[graft.operators.TextOps.rollingFingerprint]]; word mode with n=1
  * equals [[graft.operators.TextOps.minTokenHash]] (distinct is
  * irrelevant under min). Shares the window walk with the minhash
  * kernels. Null only for word-mode texts with no tokens (cannot happen
  * with split semantics — a split always yields ≥1 token). */
case class WindowMinHash32(child: Expression, n: Int, word: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (word) "word_min_hash32" else "char_min_hash32"

  override protected def nullSafeEval(input: Any): Any =
    WindowMinHash32.compute(input.asInstanceOf[UTF8String], n, word)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val out = ctx.freshName("mh")
      s"""
         |Long $out = graft.functions.WindowMinHash32.compute($t, $n, $word);
         |if ($out == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = $out.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WindowMinHash32 = copy(child = newChild)
}

object WindowMinHash32 {
  /** Boxed so the no-window case can signal null. */
  def compute(text: UTF8String, n: Int, word: Boolean): java.lang.Long = {
    var min = Long.MaxValue
    val any = NGramMinHashSig.foreachWindowHash(text.getBytes, n, word) { h =>
      if (h < min) min = h
    }
    if (!any) null else java.lang.Long.valueOf(min)
  }
}

/** Fused per-token 60-bit hash array: `transform(split(text, " "),
  * hash60)` with no interpreted lambda and no intermediate token strings —
  * the input to [[SimHash60]]'s bit voting (multiplicity and order
  * preserved; simhash votes count occurrences). hash60 = first 15 hex
  * digits of md5 = the digest's first 8 bytes as an unsigned big-endian
  * value shifted right 4. */
case class TokenHash60Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_hash60_array"

  override protected def nullSafeEval(input: Any): Any =
    TokenHash60Array.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TokenHash60Array.compute($t);")

  override protected def withNewChildInternal(
      newChild: Expression): TokenHash60Array = copy(child = newChild)
}

object TokenHash60Array {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(
      () => java.security.MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    val out = new Array[Long](nTokens)
    val md = digest.get()
    val buf = new Array[Byte](16)
    var t = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        md.digest(buf, 0, 16)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (buf(b) & 0xffL); b += 1 }
        out(t) = h >>> 4 // 64 -> 60 bits (15 hex digits)
        t += 1
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object SortedIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Fused content-defined span fingerprints: the 32-bit md5-prefix hash of
  * EVERY n-token window (stride 1), keeping only hashes ≡ 0 (mod
  * `modulus`) — Manber's "0 mod p" fingerprint selection (USENIX '94),
  * the substring-level exact-dedup primitive. Selection depends only on
  * window CONTENT, so a span repeated at arbitrary offsets in two
  * documents yields the identical selected-hash set in both (a strided
  * sample would miss any repeat whose offsets disagree mod the stride).
  * Order and multiplicity are preserved (duplicate spans inside one doc
  * count as occurrences). Equals
  * `filter(transform(wordShinglesMulti(split(text,' '), n), hash32),
  *         h -> h % modulus = 0)`
  * — spec-pinned; null (doc dropped) for texts with fewer than n tokens
  * where the composable form gives the empty array. Expected output size
  * is n_windows / modulus, so the caller's explode amplifies rows by
  * ~n_tokens/modulus, not n_tokens. */
case class WindowHashSelect(child: Expression, n: Int, modulus: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_window_select"

  override protected def nullSafeEval(input: Any): Any =
    WindowHashSelect.compute(input.asInstanceOf[UTF8String], n, modulus)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val out = ctx.freshName("sel")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.WindowHashSelect.compute($t, $n, $modulus);
         |if ($out == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): WindowHashSelect = copy(child = newChild)
}

object WindowHashSelect {
  def compute(text: UTF8String, n: Int, modulus: Int): ArrayData = {
    val bytes = text.getBytes
    var arr = new Array[Long](8)
    var m = 0
    val any = NGramMinHashSig.foreachWindowHash(bytes, n, word = true) { h =>
      if (h % modulus == 0) {
        if (m == arr.length) arr = java.util.Arrays.copyOf(arr, m * 2)
        arr(m) = h
        m += 1
      }
    }
    if (!any) null
    else new GenericArrayData(java.util.Arrays.copyOf(arr, m))
  }
}

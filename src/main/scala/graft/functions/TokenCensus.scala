package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document token census: ONE walk over the text bytes yields
  * struct<nt:int, nd:int, ns:int> — total token count, EXACT distinct
  * token count, and stopword hits. Equals
  * `(size(split(t, " ")), size(array_distinct(split(t, " "))),
  *   size(filter(split(t, " "), w => w.isin(stop:_*))))`
  * with no token-array materialization: the only per-row state is one
  * open-addressing table of int slots, reused across rows via a
  * grow-only thread-local (generation stamps mark live slots, so reuse
  * costs no per-row clear). The composed form materializes three token
  * ARRAYS per document (the weak-label census q148 spent its whole
  * 10×-data bill on them — the plan is map-only, so the constant factor
  * is the query). Token
  * boundaries replicate `split`'s regex-" " semantics exactly: segments
  * between single spaces, EMPTY segments kept (consecutive / trailing
  * spaces), empty text = one empty token. Distinctness is exact byte
  * equality — slices probe a quadratic-probing table and compare bytes
  * on hash collision, so there is no hash-collision divergence from the
  * oracle's `list_distinct`. Splitting on the 0x20 byte is UTF-8-safe
  * (multi-byte sequences never contain it). */
case class TokenCensus(child: Expression, stopwords: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("nt", IntegerType, nullable = false),
    StructField("nd", IntegerType, nullable = false),
    StructField("ns", IntegerType, nullable = false)))
  override def prettyName: String = "token_census"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenCensus.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val stops = ctx.addReferenceObj("stopwords", stopBytes,
      "byte[][]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TokenCensus.compute($in, $stops);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenCensus = copy(child = newChild)
}

object TokenCensus {
  private def hashSlice(b: Array[Byte], off: Int, len: Int): Int = {
    // FNV-1a over the token bytes; table probes re-compare bytes, so the
    // hash only steers probing and cannot affect the distinct count
    var h = 0x811c9dc5
    var i = off
    while (i < off + len) { h = (h ^ (b(i) & 0xff)) * 0x01000193; i += 1 }
    h
  }

  private def sliceEq(b: Array[Byte], o1: Int, l1: Int,
                      o2: Int, l2: Int): Boolean = {
    if (l1 != l2) return false
    var i = 0
    while (i < l1) {
      if (b(o1 + i) != b(o2 + i)) return false
      i += 1
    }
    true
  }

  private def sliceEqBytes(b: Array[Byte], off: Int, len: Int,
                           w: Array[Byte]): Boolean = {
    if (len != w.length) return false
    var i = 0
    while (i < len) {
      if (b(off + i) != w(i)) return false
      i += 1
    }
    true
  }

  /** Grow-only per-thread probe table (offset/length per slot, with a
    * GENERATION stamp instead of a boolean so reuse never pays an
    * O(cap) clear): tasks are single-threaded over rows, so the thread
    * local is race-free, and the table only ever grows to the largest
    * document a thread has seen (ADVICE r13 — the per-row allocations
    * the doc claimed away really were per-row). Table size cannot
    * affect results: slots only steer probing, and every hit
    * re-compares bytes. */
  private final class Scratch {
    var cap = 0
    var offs: Array[Int] = null
    var lens: Array[Int] = null
    var stamps: Array[Int] = null
    var gen = 0
  }
  private val scratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  /** Grow-only has a pathological tail (ADVICE r14): ONE giant document
    * would pin ~12 bytes/slot on every executor thread that saw it for
    * the thread pool's lifetime. Above this slot count (4M slots ≈
    * 48 MB/thread) the scratch resets to initial state after the row's
    * counts are assembled; ordinary corpora never cross it, so the
    * zero-per-row-allocation reuse is unchanged on the hot path. */
  private val ShrinkCapThreshold = 1 << 22

  def compute(text: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val b = text.getBytes
    // token count = spaces + 1 (split(-1) semantics: empties kept)
    var nt = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') nt += 1; i += 1 }
    // Capacity 2x tokens rounded to a power of two keeps load factor
    // <= 0.5; quadratic probing terminates on power-of-two capacities.
    // The bound keeps nt * 2 and cap <<= 1 inside Int (ADVICE r13: a
    // ~2^30-token value would wrap negative and loop) — a single
    // half-gigabyte-token document is upstream-splitting territory, so
    // fail loudly rather than mis-size.
    if (nt >= (1 << 29))
      throw new IllegalArgumentException(
        s"token_census: $nt tokens in one document exceeds 2^29 — " +
          "chunk the document upstream")
    var cap = 8
    while (cap < nt * 2) cap <<= 1
    val sc = scratch.get()
    if (sc.cap < cap) {
      sc.cap = cap
      sc.offs = new Array[Int](cap)
      sc.lens = new Array[Int](cap)
      sc.stamps = new Array[Int](cap)
      sc.gen = 0
    }
    if (sc.gen == Int.MaxValue) {
      java.util.Arrays.fill(sc.stamps, 0)
      sc.gen = 0
    }
    sc.gen += 1
    val gen = sc.gen
    val tcap = sc.cap // may exceed cap (grow-only) — lower load, same counts
    val offs = sc.offs
    val lens = sc.lens
    val stamps = sc.stamps
    var nd = 0
    var ns = 0
    var start = 0
    i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        val len = i - start
        // stopword check
        var w = 0
        while (w < stops.length) {
          if (sliceEqBytes(b, start, len, stops(w))) { ns += 1; w = stops.length }
          else w += 1
        }
        // distinct probe
        val h = hashSlice(b, start, len)
        var slot = h & (tcap - 1)
        var step = 1
        var done = false
        while (!done) {
          if (stamps(slot) != gen) {
            stamps(slot) = gen; offs(slot) = start; lens(slot) = len
            nd += 1; done = true
          } else if (sliceEq(b, offs(slot), lens(slot), start, len)) {
            done = true
          } else {
            slot = (slot + step) & (tcap - 1); step += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (tcap > ShrinkCapThreshold) {
      sc.cap = 0; sc.offs = null; sc.lens = null; sc.stamps = null
      sc.gen = 0
    }
    new GenericInternalRow(Array[Any](nt, nd, ns))
  }
}

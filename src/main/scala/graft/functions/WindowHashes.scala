package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `window_hashes(text, L)`: a 16-byte hash for EVERY length-L token
 * window of `text` (single-space tokenization), or an empty array when
 * the document has fewer than L tokens — the dup-span window-hash
 * materialization ([[graft.ops.Dedup.duplicateSpans]]) without per-window
 * string assembly or md5.
 *
 * Like [[NgramShingles]], every token window is a contiguous BYTE
 * SUBSTRING of the input (tokens are split on the single ' ' byte, which
 * is never a UTF-8 continuation byte), so all window hashes come from
 * TWO prefix polynomial hashes over the document's bytes — one O(len)
 * pass, each window an O(1) range query. This replaces, per window, a
 * token-slice + separator-join + md5 over the assembled string (the r14
 * stage profile's dominant CPU at 1000×: ~1601 task-seconds of the
 * q_dup_spans row were this materialization).
 *
 * Exactness class is UNCHANGED from md5: two independent 61-bit Mersenne
 * polynomial hashes (bases 257 and 1000003) give per-pair collision
 * probability ~2⁻¹²², vs md5's 2⁻¹²⁸ — both "exact up to astronomically
 * unlikely hash collisions" (at 10¹² corpus windows the expected number
 * of colliding pairs is ~10⁻¹³). Within one document's windows the pair
 * (h1, h2) distinguishes ("ab","c") from ("a","bc") the same way the
 * chr(31)-joined md5 did: the interior ' ' bytes participate in the
 * hash, so distinct token sequences are distinct byte strings.
 *
 * The SQL oracle stays the md5 replay: it compares the OUTPUT spans, not
 * the hashes, and any exact repeated-window detector yields identical
 * spans.
 */
case class WindowHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 2) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "window_hashes requires STRING input and window length >= 2")

  override protected def nullSafeEval(input: Any): Any =
    WindowHashes.hashesArray(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WindowHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $helper.hashesArray($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  private val Base1 = 257L
  private val Base2 = 1000003L
  private val Mod = (1L << 61) - 1

  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val lo61 = lo & Mod
    val carry = (hi << 3) | (lo >>> 61)
    var r = lo61 + carry
    if (r >= Mod) r -= Mod
    r
  }

  /** Codegen entry point: 16-byte (two-poly) hash per length-n token
    * window over the UTF-8 bytes; empty array under n tokens. */
  def hashesArray(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var tokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) tokens += 1; i += 1 }
    if (tokens < n) return new GenericArrayData(Array.empty[Any])

    val starts = new Array[Int](tokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = len + 1 // sentinel: token end = next start - 1

    // Transient per-doc memory (r15 advice, documented bound): the two
    // prefix arrays are 16 B per input byte; the pow arrays are sized to
    // the LONGEST WINDOW's byte length only (the sole exponents queried),
    // not the document — so a multi-megabyte document with ordinary
    // window sizes costs ~16x its byte length transiently, plus the
    // 16-byte-per-window output.
    var maxWin = 0
    var g0 = 0
    while (g0 <= tokens - n) {
      val w = starts(g0 + n) - 1 - starts(g0)
      if (w > maxWin) maxWin = w
      g0 += 1
    }
    val prefix1 = new Array[Long](len + 1)
    val prefix2 = new Array[Long](len + 1)
    val pow1 = new Array[Long](maxWin + 1)
    val pow2 = new Array[Long](maxWin + 1)
    pow1(0) = 1L; pow2(0) = 1L
    i = 0
    while (i < len) {
      // bytes as unsigned so multi-byte UTF-8 stays injective
      val b = bytes(i) & 0xff
      prefix1(i + 1) = (mulmod(prefix1(i), Base1) + b) % Mod
      prefix2(i + 1) = (mulmod(prefix2(i), Base2) + b) % Mod
      if (i < maxWin) {
        pow1(i + 1) = mulmod(pow1(i), Base1)
        pow2(i + 1) = mulmod(pow2(i), Base2)
      }
      i += 1
    }

    val out = new Array[Any](tokens - n + 1)
    var g = 0
    while (g <= tokens - n) {
      val from = starts(g)
      val until = starts(g + n) - 1
      var h1 = prefix1(until) - mulmod(prefix1(from), pow1(until - from))
      if (h1 < 0) h1 += Mod
      var h2 = prefix2(until) - mulmod(prefix2(from), pow2(until - from))
      if (h2 < 0) h2 += Mod
      val b = new Array[Byte](16)
      var k = 0
      while (k < 8) {
        b(k) = (h1 >>> (56 - 8 * k)).toByte
        b(k + 8) = (h2 >>> (56 - 8 * k)).toByte
        k += 1
      }
      out(g) = b
      g += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(WindowHashes(Bridge.expression(c), n))
}

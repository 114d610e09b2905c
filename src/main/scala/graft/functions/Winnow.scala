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
 * `winnow_fingerprints(text)`: document fingerprinting by winnowing —
 * polynomial ROLLING hash over character k-grams, then the minimum hash
 * of each sliding window of `w` hashes (deduplicated), per the classic
 * MOSS scheme. Local document edits perturb only nearby fingerprints,
 * so shared fingerprints ⇒ shared substrings (plagiarism/near-dup
 * evidence at substring granularity, complementing MinHash's set view).
 *
 * Native expression with codegen: the rolling hash is O(n) per document
 * (k-gram hash updated incrementally, not recomputed), the winnow pass
 * O(n) amortized — one tight JIT'd loop per row.
 */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0 && w > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires STRING input and positive k/w")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowFingerprints.fingerprints(
      input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WinnowFingerprints.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $helper.fingerprintsArray($c.toString(), $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val Base = 257L
  private val Mod = (1L << 61) - 1 // Mersenne prime: fast mod, no overflow via mulmod

  private def mulmod(a: Long, b: Long): Long = {
    // 61-bit-safe multiplication via Math.multiplyHigh decomposition
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // (hi,lo) mod 2^61-1: fold 128-bit product into 61-bit residue
    val lo61 = lo & Mod
    val carry = (hi << 3) | (lo >>> 61)
    var r = lo61 + carry
    if (r >= Mod) r -= Mod
    r
  }

  /** Rolling-hash + winnowing fingerprints (sorted distinct minima). */
  def fingerprints(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array(hashOf(text))
    val nHashes = n - k + 1
    val hashes = new Array[Long](nHashes)
    // initial k-gram hash and base^(k-1) for the roll-off term
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) {
      h = (mulmod(h, Base) + text.charAt(i)) % Mod
      if (i < k - 1) pow = mulmod(pow, Base)
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < nHashes) {
      val off = mulmod(text.charAt(i - 1), pow)
      h = h - off
      if (h < 0) h += Mod
      h = (mulmod(h, Base) + text.charAt(i + k - 1)) % Mod
      hashes(i) = h
      i += 1
    }
    // winnow: min of each window of w hashes, dedup consecutive picks
    val out = new java.util.TreeSet[java.lang.Long]()
    if (nHashes <= w) { out.add(hashes.min); }
    else {
      var start = 0
      while (start + w <= nHashes) {
        var m = hashes(start)
        var j = start + 1
        while (j < start + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
        out.add(m)
        start += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    arr
  }

  private def hashOf(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (mulmod(h, Base) + s.charAt(i)) % Mod; i += 1 }
    h
  }

  /** Codegen entry point. */
  def fingerprintsArray(text: String, k: Int, w: Int): ArrayData =
    new GenericArrayData(fingerprints(text, k, w))

  def apply(c: Column, k: Int = 8, w: Int = 8): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), k, w))
}

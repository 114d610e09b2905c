package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-word BPE applier with the EXACT semantics of
 * [[graft.ops.Bpe.encodeState]]'s nested replaces — merges applied in
 * rank order, each as one leftmost-first non-overlapping fuse pass over
 * the word's symbol sequence (the `String.replace` semantics the DuckDB
 * oracle replays) — plus a per-executor word memo. Word boundaries can't
 * be crossed by construction (encodeState's `|` guard becomes simply
 * "process words independently").
 *
 * Why: the nested-replace form scans and REBUILDS the whole ~3×-expanded
 * document state string once per merge (O(nMerges × stateLen) per doc,
 * all allocation). Per-word application is O(nMerges × wordLen) on a
 * small array — and word frequency is Zipf, so the memo collapses almost
 * every occurrence to one hash probe (amplified corpora are the extreme
 * case: 1000× copies share one vocabulary).
 *
 * The memo is bounded (1M entries) and lives in the expression's
 * broadcast reference object: shared by every task in the executor that
 * deserialized it, correct even when cold (a miss just recomputes).
 */
final class BpeCounter(val merges: Array[(String, String)]) extends Serializable {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val CacheCap = 1 << 20

  /** Symbols left after applying all merges to one word. */
  def countWord(w: String): Int = {
    val hit = cache.get(w)
    if (hit != null) return hit.intValue()
    var toks = new Array[String](w.length)
    var i = 0
    while (i < w.length) { toks(i) = String.valueOf(w.charAt(i)); i += 1 }
    var n = w.length
    var m = 0
    while (m < merges.length && n > 1) {
      val l = merges(m)._1; val r = merges(m)._2
      // leftmost-first non-overlapping fuse of (l, r), in place
      var src = 0; var dst = 0
      while (src < n) {
        if (src + 1 < n && toks(src) == l && toks(src + 1) == r) {
          toks(dst) = l + r; src += 2
        } else { toks(dst) = toks(src); src += 1 }
        dst += 1
      }
      n = dst
      m += 1
    }
    if (cache.size < CacheCap) cache.put(w, Integer.valueOf(n))
    n
  }

  /** BPE token count of a whole document (words on single spaces;
    * empty text counts 0 — the [[graft.ops.Bpe.tokenCountAfter]]
    * convention). */
  def countDoc(text: UTF8String): Long = {
    val s = text.toString
    if (s.isEmpty) return 0L
    var total = 0L
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) total += countWord(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }
}

/** `bpe_token_count(text)`: document BPE token count under a fixed merge
  * table — one codegen'd call into the memoized [[BpeCounter]]. */
case class BpeTokenCount(child: Expression, counter: BpeCounter)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("bpe_token_count requires STRING input")

  override protected def nullSafeEval(input: Any): Any =
    counter.countDoc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCounter", counter, classOf[BpeCounter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countDoc($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(c), new BpeCounter(merges.toArray)))
}

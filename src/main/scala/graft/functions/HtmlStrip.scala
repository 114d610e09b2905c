package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `html_strip(text)`: boilerplate removal for web-scraped corpora — the
 * standard first pass before quality scoring / dedup of crawl data.
 * ONE codegen'd scan per document replaces the three-regex chain
 *
 *   trim(regexp_replace(regexp_replace(<entity decode>(
 *     regexp_replace(text, '<[^>]*>', ' ')), '[ \t\n\r]+', ' '), ...))
 *
 * with identical output (spec-pinned against exactly that chain, and the
 * SQL oracle runs the chain form):
 *
 *  - tags `<...>` become one space (word boundary preserved: `a<br>b`
 *    must not fuse to `ab`); a `<` with no closing `>` is NOT a tag and
 *    stays literal, matching the regex `'<[^>]*>'` which cannot match
 *    without the closing bracket;
 *  - the five XML entities + `&nbsp;` decode (`&amp; &lt; &gt; &quot;
 *    &#39; &nbsp;`); decode happens AFTER tag handling, so `&lt;b&gt;`
 *    yields literal `<b>` and is not re-stripped — same order as the
 *    oracle chain; unknown `&...` sequences stay literal;
 *  - whitespace runs (space, tab, CR, LF — including spaces minted by
 *    tag removal and `&nbsp;`) collapse to one space; leading/trailing
 *    whitespace drops (trim).
 *
 * Scale shape: narrow per-row map, no shuffle, whole-stage codegen;
 * single pass, no intermediate string per regex stage.
 */
case class HtmlStrip(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_strip"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("html_strip requires STRING input")

  override protected def nullSafeEval(input: Any): Any =
    HtmlStrip.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = HtmlStrip.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.strip($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlStrip =
    copy(child = newChild)
}

object HtmlStrip {

  private val entities: Array[(String, Char)] = Array(
    "&amp;" -> '&', "&lt;" -> '<', "&gt;" -> '>',
    "&quot;" -> '"', "&#39;" -> '\'')

  def strip(s: UTF8String): UTF8String = {
    val in = s.toString
    val n = in.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false // a collapsed whitespace run awaiting a word
    var i = 0
    def emit(c: Char): Unit = {
      if (pendingSpace) {
        if (out.length > 0) out.append(' ') // leading runs trim away
        pendingSpace = false
      }
      out.append(c)
    }
    while (i < n) {
      val c = in.charAt(i)
      if (c == '<') {
        val close = in.indexOf('>', i + 1)
        if (close >= 0) { // whole tag -> one (collapsible) space
          pendingSpace = true
          i = close + 1
        } else { // no closing '>': the regex can't match either — literal
          emit('<')
          i += 1
        }
      } else if (c == '&') {
        if (in.startsWith("&nbsp;", i)) { pendingSpace = true; i += 6 }
        else {
          var e = 0
          var matched = false
          while (e < entities.length && !matched) {
            val (ent, ch) = entities(e)
            if (in.startsWith(ent, i)) { emit(ch); i += ent.length; matched = true }
            e += 1
          }
          if (!matched) { emit('&'); i += 1 }
        }
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        pendingSpace = true
        i += 1
      } else {
        emit(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString) // trailing pendingSpace drops = trim
  }

  def apply(c: Column): Column = Bridge.column(HtmlStrip(Bridge.expression(c)))
}

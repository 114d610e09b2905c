package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `regex_count_matches(text)`: the number of non-overlapping matches of
 * `pattern` — exactly what `size(regexp_extract_all(text, pattern, 0))`
 * computes (both are the same `java.util.regex` `find()` loop), WITHOUT
 * materializing the match array: RegExpExtractAll builds an ArrayData of
 * UTF8String copies per row just so `size` can throw it away. On the PII
 * category scan that array churn is the whole point of the expression
 * (r20; the r19 "not yet optimized" item 1). The pattern is a literal
 * compiled once per expression instance; count semantics are identical
 * to the extract_all form for every pattern in the portable
 * RE2 ∩ java.util.regex dialect the PII library uses (pinned by
 * PiiCountEquivalenceSpec against size(regexp_extract_all) on
 * adversarial inputs).
 */
case class RegexCountMatches(child: Expression, pattern: String)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "regex_count_matches"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("regex_count_matches requires STRING input")

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override protected def nullSafeEval(input: Any): Any =
    RegexCountMatches.count(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = RegexCountMatches.getClass.getName.stripSuffix("$")
    val p = ctx.addReferenceObj("pattern", compiled,
      classOf[java.util.regex.Pattern].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.count($p, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexCountMatches =
    copy(child = newChild)
}

object RegexCountMatches {
  def count(p: java.util.regex.Pattern, s: UTF8String): Int = {
    val m = p.matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def apply(c: Column, pattern: String): Column =
    Bridge.column(RegexCountMatches(Bridge.expression(c), pattern))
}

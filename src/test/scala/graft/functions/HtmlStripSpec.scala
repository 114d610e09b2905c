package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** html_strip: single-pass scanner vs the three-regex chain it
  * replaces, plus the edge semantics the chain defines. */
class HtmlStripSpec extends SparkSpec {
  import spark.implicits._

  /** The contract form: tag->space, entity decode (&amp; last),
    * whitespace collapse, trim — built from Spark primitives. */
  private def chain(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val tagless = regexp_replace(c, "<[^>]*>", " ")
    val decoded = replace(replace(replace(replace(replace(replace(
      tagless,
      lit("&nbsp;"), lit(" ")), lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")), lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }

  private val cases = Seq(
    "<p>hello <b>world</b></p>",
    "a<br>b",                          // tag must leave a word boundary
    "&lt;b&gt;not a tag&lt;/b&gt;",    // decoded brackets stay literal
    "&amp;lt; stays &amp;nbsp; literal", // no double decode
    "x &unknown; y",                   // unknown entity untouched
    "  \t\n lots   of\r\nspace  ",
    "2 < 3 and 5 > 4",                 // unterminated '<' is literal
    "<a href=\"x\">link</a>&nbsp;&#39;q&#39;&quot;w&quot;",
    "<empty></empty>",
    "< >",                             // a real (space-only) tag
    "trailing open <tag never closes",
    ""
  )

  test("single-pass output equals the regex-chain contract on every edge case") {
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "s")
    val got = df.select(col("id"), HtmlStrip(col("s")).as("a"), chain(col("s")).as("b"))
      .collect()
    for (r <- got)
      assert(r.getString(1) == r.getString(2),
        s"case ${r.getInt(0)}: '${cases(r.getInt(0))}' -> single-pass " +
          s"'${r.getString(1)}' vs chain '${r.getString(2)}'")
  }

  test("specific expected outputs") {
    val df = Seq(
      ("<p>hello <b>world</b></p>", "hello world"),
      ("a<br>b", "a b"),
      ("&lt;b&gt;x&lt;/b&gt;", "<b>x</b>"),
      // '< 3 and 5 >' IS a match for '<[^>]*>' — the chain semantics the
      // scanner reproduces (a '<' is only literal when no '>' follows)
      ("2 < 3 and 5 > 4", "2 4"),
      ("2 < 3 no close", "2 < 3 no close"),
      ("A&nbsp;&amp;&nbsp;B", "A & B"),
      ("trailing open <tag never closes", "trailing open <tag never closes")
    ).toDF("s", "want")
    val bad = df.where(HtmlStrip(col("s")) =!= col("want"))
      .select(col("s"), HtmlStrip(col("s"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("null passes through; plan stays codegen'd (no shuffle, no udf)") {
    val df = Seq(Some("<p>x</p>"), None).toDF("s")
    val out = df.select(HtmlStrip(col("s"))).collect()
    assert(out(0).getString(0) == "x" && out(1).isNullAt(0))
    val plan = df.select(HtmlStrip(col("s"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("batchevalpython"))
  }
}

package graft.functions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** r20 pin for the PII count-matches expression: RegexCountMatches must
  * count exactly like size(regexp_extract_all(text, re, 0)) — both are
  * the java.util.regex find() loop — on every PII pattern and on the
  * boundary shapes that could diverge (adjacent matches, matches at the
  * string edges, overlap candidates, empty text, unicode, nulls). */
class PiiCountEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    "contact a@b.co c@d.org e@f.io",                 // adjacent emails
    "1.2.3.4 5.6.7.8",                               // edge-to-edge ipv4
    "123-45-6789123-45-6789",                        // SSN-like run: greedy boundaries
    "999999999999",                                  // one long digit run (longnum is greedy)
    "12345",                                         // below longnum floor
    "x123456y1234567z",                              // embedded long digit runs
    "",                                              // empty text
    " .@- ",                                         // punctuation soup, no matches
    "üñïçødé test@exämple.com 10.0.0.1 日本語 123456",  // unicode around matches
    "a@b.co.123-45-6789.999999 1.2.3.4",             // categories overlapping each other
    (1 to 50).map(i => s"u$i@host$i.net").mkString(" ")  // many matches in one row
  )

  test("RegexCountMatches == size(regexp_extract_all) on all PII patterns") {
    val df = (fixtures.map(Option(_)) :+ None).toDF("text")
    TextAnalysis.PiiPatterns.foreach { case (name, re) =>
      val rows = df.select(
        RegexCountMatches(col("text"), re).cast("long").as("fast"),
        size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long").as("ref"),
        col("text")).collect()
      rows.foreach { r =>
        if (r.isNullAt(2)) {
          assert(r.isNullAt(0) && (r.isNullAt(1) || r.getLong(1) == -1L),
            s"$name: null handling diverged: $r")
        } else
          assert(r.getLong(0) == r.getLong(1),
            s"$name diverged on '${r.getString(2)}': fast=${r.getLong(0)} ref=${r.getLong(1)}")
      }
    }
  }
}

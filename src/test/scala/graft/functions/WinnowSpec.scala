package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprint properties: determinism, substring evidence,
  * locality of edits. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fp(s: String): Set[Long] =
    WinnowFingerprints.fingerprints(s, 8, 8).toSet

  test("identical text → identical fingerprints; short text handled") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    assert(fp(t) == fp(t))
    assert(fp("abc").size == 1) // shorter than k → whole-string hash
    assert(fp("") == fp(""))
  }

  test("shared substrings → shared fingerprints; disjoint text → none") {
    val core = "a very long shared passage of text that should dominate the fingerprint set"
    val a = s"PREFIX ONE $core SUFFIX ALPHA"
    val b = s"other start $core different ending"
    val overlap = (fp(a) & fp(b)).size.toDouble / math.min(fp(a).size, fp(b).size)
    assert(overlap > 0.5, s"overlap $overlap")
    val c = "completely unrelated content with nothing in common whatsoever here"
    assert((fp(a) & fp(c)).isEmpty)
  }

  test("local edit perturbs only nearby fingerprints") {
    val orig = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val edited = orig.replace("seven", "SEVEN")
    val kept = (fp(orig) & fp(edited)).size.toDouble / fp(orig).size
    assert(kept > 0.4, s"kept $kept")
  }

  test("works as a codegen'd column over documents") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), WinnowFingerprints(col("text")).as("fps"))
    val rows = df.orderBy("doc_id").limit(5).collect()
    assert(rows.forall(_.getSeq[Long](1).nonEmpty))
    // deterministic across runs
    val again = df.orderBy("doc_id").limit(5).collect()
    assert(rows.map(_.getSeq[Long](1)).toSeq == again.map(_.getSeq[Long](1)).toSeq)
  }
}

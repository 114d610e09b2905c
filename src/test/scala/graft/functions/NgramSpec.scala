package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NgramShingles/NgramHashes vs the reference higher-order-function
  * formulation: identical shingle strings, hash identity ⇔ string
  * identity — including the whitespace edge cases (double spaces,
  * leading/trailing spaces, under-n-token docs, unicode). */
class NgramSpec extends SparkSpec {
  import spark.implicits._

  /** The original (interpreted) formulation, kept as the semantics
    * oracle the codegen'd expression is pinned against. */
  private def shinglesHof(text: org.apache.spark.sql.Column, n: Int) = {
    val ws = split(text, " ")
    when(size(ws) < n, array(text)).otherwise(
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*)))
  }

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b", "a", "", "   ", "a  b c", " leading", "trailing ",
    "exactly three words", "ünïcode wörds høre are fine too",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")

  test("NgramShingles equals the transform/concat_ws formulation") {
    for (n <- Seq(1, 2, 3, 8)) {
      val df = cases.toDF("text").select(
        shinglesHof(col("text"), n).as("hof"),
        NgramShingles(col("text"), n).as("fast"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n mismatch for ${r.getSeq[String](0)}")
      }
    }
  }

  test("NgramHashes: same gram count; equal hash ⇔ equal gram string") {
    for (n <- Seq(3, 8)) {
      val rows = cases.toDF("text").select(
        NgramShingles(col("text"), n).as("sh"),
        NgramHashes(col("text"), n).as("h")).collect()
      val pairs = rows.flatMap(r => r.getSeq[String](0).zip(r.getSeq[Long](1)))
      pairs.groupBy(_._1).foreach { case (s, ps) =>
        assert(ps.map(_._2).distinct.length == 1, s"gram '$s' hashed inconsistently")
      }
      // distinct grams got distinct hashes (no collisions on this input)
      assert(pairs.map(_._1).distinct.length == pairs.map(_._2).distinct.length)
    }
  }

  test("hashes agree with shingle identity on the documents table") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val viaStrings = docs.select(explode(NgramShingles(col("text"), 8)).as("sh"))
      .agg(countDistinct(col("sh"))).collect()(0).getLong(0)
    val viaHashes = docs.select(explode(NgramHashes(col("text"), 8)).as("h"))
      .agg(countDistinct(col("h"))).collect()(0).getLong(0)
    assert(viaStrings == viaHashes)
  }

  test("normalizeText: NFC folds accents, controls stripped, idempotent") {
    import graft.ops.TextAnalysis.normalizeText
    val composed = "caf\u00e9"                 // é as one codepoint
    val decomposed = "cafe\u0301"              // e + combining acute
    val rows = Seq(
      ("a", composed), ("b", decomposed),
      ("c", "Tabs\tand\nnewlines\rhere"),
      ("d", "  MANY   spaces   "),
      ("e", "")
    ).toDF("id", "t").select(col("id"), normalizeText(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("a") == rows("b"), "NFC makes composed = decomposed")
    assert(rows("a") == "caf\u00e9")
    assert(rows("c") == "tabsandnewlineshere", "control chars stripped")
    assert(rows("d") == "many spaces")
    assert(rows("e") == "")
    // idempotence: normalizing a normalized string is a no-op
    val once = Seq(("x", "  Caf\u00e9\t du   Monde ")).toDF("id", "t")
      .select(normalizeText(col("t")).as("n"))
    val twice = once.select(normalizeText(col("n")).as("n"))
    assert(once.collect()(0).getString(0) == twice.collect()(0).getString(0))
  }
}

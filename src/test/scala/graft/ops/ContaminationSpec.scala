package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benchmark contamination: exact-overlap detection, short-doc whole-text
  * shingles, and broadcast/shuffle path equivalence. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "a b c d e f g h i j"),       // shares the 8-gram c..j with eval 100
    (2L, "z y x w v u t s r q"),       // clean
    (3L, "one two three")              // short: whole text is the shingle
  ).toDF("doc_id", "text")

  private val eval0 = Seq(
    (100L, "c d e f g h i j k l"),
    (101L, "one two three")
  ).toDF("doc_id", "text")

  test("overlapping n-grams are flagged; clean docs are not") {
    val rows = Contamination.flagOverlap(train, eval0, n = 8)
      .orderBy("doc_id").collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_contaminated"), r.getAs[Int]("contaminated"))).toMap
    assert(byId(1L)._1 >= 1 && byId(1L)._2 == 1)
    assert(byId(2L) == ((0L, 0)))
    assert(byId(3L)._2 == 1) // exact short-doc copy caught via whole-text shingle
  }

  test("n_shingles counts distinct n-grams (len - n + 1 for unique text)") {
    val rows = Contamination.flagOverlap(train, eval0, n = 8)
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("n_shingles") == 3) // 10 tokens -> 3 8-grams
    assert(rows(2).getAs[Long]("n_shingles") == 1) // short doc -> whole text
  }

  test("broadcast and shuffle paths agree") {
    val a = Contamination.flagOverlap(train, eval0, n = 8, broadcastEval = true)
      .orderBy("doc_id").collect()
    val b = Contamination.flagOverlap(train, eval0, n = 8, broadcastEval = false)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase prefix-sum sequence packing: equality with the one-partition
  * window formulation, span arithmetic, and block-size invariance. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0 until n)
    .map(i => (i.toLong, Seq.fill(i % 7 + 1)("w").mkString(" ")))
    .toDF("doc_id", "text")

  test("two-phase prefix sum equals the single-window formulation") {
    val d = docs(500).repartition(13)
    val got = Packing.packedSpans(d, seqLen = 16, blockSize = 32L)
      .orderBy("doc_id").collect()
    val w = Window.orderBy("doc_id")
    val want = d.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .withColumn("start_off", coalesce(sum("n").over(w), lit(0L)) - col("n"))
      .orderBy("doc_id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, e) =>
      assert(g.getAs[Long]("doc_id") == e.getAs[Long]("doc_id"))
      assert(g.getAs[Long]("start_off") == e.getAs[Long]("start_off"),
        s"doc ${g.getAs[Long]("doc_id")}")
    }
  }

  test("spans tile the token stream exactly and seq ids are consistent") {
    val rows = Packing.packedSpans(docs(200), seqLen = 10, blockSize = 64L)
      .orderBy("doc_id").collect()
    var expectedStart = 0L
    rows.foreach { r =>
      val (nt, s, e) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_off"),
        r.getAs[Long]("end_off"))
      assert(s == expectedStart); assert(e == s + nt - 1)
      assert(r.getAs[Long]("first_seq") == s / 10)
      assert(r.getAs[Long]("last_seq") == e / 10)
      assert(r.getAs[Long]("n_seqs") == e / 10 - s / 10 + 1)
      expectedStart += nt
    }
  }

  test("block size does not change the result") {
    val d = docs(300)
    val a = Packing.packedSpans(d, 32, blockSize = 7L).orderBy("doc_id").collect()
    val b = Packing.packedSpans(d, 32, blockSize = 1000L).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("zero-token documents take no span") {
    val d = Seq((0L, "a b c"), (1L, ""), (2L, "d")).toDF("doc_id", "text")
    val rows = Packing.packedSpans(d, 2).orderBy("doc_id").collect()
    assert(rows(1).getAs[Long]("n_tokens") == 0L)
    assert(rows(1).getAs[Long]("n_seqs") == 0L)
    // the empty doc's neighbors are contiguous across it
    assert(rows(2).getAs[Long]("start_off") == rows(0).getAs[Long]("end_off") + 1)
  }
}

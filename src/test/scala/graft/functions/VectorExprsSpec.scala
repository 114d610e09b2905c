package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Direct contracts for the fused vector expressions that the ANN serve
 * paths lean on. The positive distance/encode behavior is pinned
 * end-to-end by the oracle queries and LayoutSpec; this suite pins the
 * fail-loud edges that only show up with inputs the bench never builds.
 */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  test("PqAdcDist packed-LONG input rejects kSub != 16 at plan time") {
    // 4-bit nibble decode is only correct for 16-entry sub-codebooks; a
    // kSub=8 LUT over a packed layout must fail analysis, not return
    // silently wrong distances.
    val m = 4
    val lutK8 = Seq(Seq.fill(m * 8)(0.0))
    val df = Seq((0L, 1L)).toDF("packed", "qid")
    val ex = intercept[Exception] {
      df.select(PqAdcDist($"packed", $"qid", Seq(1L), lutK8, m)).collect()
    }
    assert(ex.getMessage.contains("kSub == 16"),
      s"expected the packed kSub guard to fire, got: ${ex.getMessage}")
  }

  test("PqAdcDist packed-LONG kSub == 16 still plans and evaluates") {
    val m = 4
    // LUT row: entry (s, code) = s*100 + code, so the decode order is audited
    val lut = Seq((0 until m * 16).map(i => (i / 16) * 100.0 + (i % 16)))
    // packed codes 1,2,3,4 MSB-first (Similarity.pqPack format)
    val packed = (1L << 12) | (2L << 8) | (3L << 4) | 4L
    val df = Seq((packed, 7L)).toDF("packed", "qid")
    val got = df.select(PqAdcDist($"packed", $"qid", Seq(7L), lut, m).as("d"))
      .as[Double].head()
    assert(got == (0 * 100 + 1) + (1 * 100 + 2) + (2 * 100 + 3) + (3 * 100 + 4))
  }

  test("PqAdcDist array-codes input accepts kSub != 16") {
    val m = 2
    val lutK4 = Seq((0 until m * 4).map(_.toDouble))
    val df = Seq((Array(1, 3), 5L)).toDF("codes", "qid")
    val got = df.select(PqAdcDist($"codes", $"qid", Seq(5L), lutK4, m).as("d"))
      .as[Double].head()
    assert(got == 1.0 + (4 + 3).toDouble)
  }
}

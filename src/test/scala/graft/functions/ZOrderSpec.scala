package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton key correctness + the layout property it exists for: z-ordered
  * files are narrow in BOTH dimensions, single-column sorts are not. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave golden values") {
    assert(ZOrderKey.interleave(0L, 0L) == 0L)
    assert(ZOrderKey.interleave(1L, 0L) == 1L)
    assert(ZOrderKey.interleave(0L, 1L) == 2L)
    assert(ZOrderKey.interleave(3L, 3L) == 15L)
    assert(ZOrderKey.interleave(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrderKey.interleave(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
  }

  test("interleave is invertible (random 32-bit coordinates)") {
    def compress(v: Long): Long = { // inverse of spread
      var x = v & 0x5555555555555555L
      x = (x | (x >>> 1)) & 0x3333333333333333L
      x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
      (x | (x >>> 16)) & 0xFFFFFFFFL
    }
    val rnd = new scala.util.Random(7)
    (1 to 1000).foreach { _ =>
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0xFFFFFFFFL
      val z = ZOrderKey.interleave(x, y)
      assert(compress(z) == x && compress(z >>> 1) == y)
    }
  }

  test("expression matches driver-side interleave (codegen path)") {
    val df = (1L to 500L).map(i => (i * 7919 % 1048576, i * 104729 % 1048576))
      .toDF("x", "y").repartition(5)
    val got = df.select(col("x"), col("y"), ZOrderKey(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrderKey.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-order layout bounds BOTH dimensions per file; x-sort does not") {
    // 64×64 grid, shuffled: range-partition 16 ways by x alone vs by the
    // Morton key, then measure each partition's y-span. The x-sorted
    // layout leaves y unconstrained (span ≈ full domain); the z-ordered
    // layout keeps every partition a compact tile — this is exactly why
    // min/max row-group stats can prune y-filtered scans of a z-ordered
    // table but not of an x-sorted one.
    val pts = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)).toDF("x", "y")
      .repartition(13) // destroy any incidental order
    def ySpans(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max("y") - min("y")).as("span"))
        .collect().map(_.getAs[Long]("span")).toSeq
    val xSorted = pts.repartitionByRange(16, col("x"))
    val zSorted = pts.repartitionByRange(16, ZOrderKey(col("x"), col("y")))
    val xSpan = ySpans(xSorted).sum.toDouble / 16
    val zSpan = ySpans(zSorted).sum.toDouble / 16
    assert(xSpan > 60.0, s"x-sorted layout should leave y unbounded, got $xSpan")
    assert(zSpan < 24.0, s"z-ordered layout should tile y, got $zSpan")
  }
}

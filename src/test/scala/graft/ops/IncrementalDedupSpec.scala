package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Incremental near-dup detection: batch-vs-index + within-batch. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("later batches detect dups of earlier batches via the index") {
    val base = Files.createTempDirectory("incdedup").toString
    val d = new IncrementalDedup(s"$base/index")

    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different text about distributed query engines")
    ).toDF("doc_id", "text")
    val r1 = d.processBatch(b1).collect()
    assert(r1.forall(_.isNullAt(r1.head.fieldIndex("dup_of"))))

    val b2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (4L, "fresh unseen content with no earlier match at all"),
      (5L, "fresh unseen content with no earlier match at all") // dup of 4, same batch
    ).toDF("doc_id", "text")
    val r2 = d.processBatch(b2).collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(r.fieldIndex("dup_of"))) None
                       else Some(r.getAs[Long]("dup_of")))).toMap
    assert(r2(3L) == Some(1L))
    assert(r2(4L) == None)
    assert(r2(5L) == Some(4L))
  }

  test("streaming wrapper annotates and persists across restarts") {
    val base = Files.createTempDirectory("incdedup2").toString
    val in = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    val d = new IncrementalDedup(s"$base/index")

    Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def run(): Unit = {
      val q = d.start(spark.readStream.schema(schema).parquet(in),
        s"$base/out", s"$base/ckpt")
      q.awaitTermination(120000)
      ()
    }
    run()
    Seq((11L, "alpha beta gamma delta epsilon zeta eta theta")) // dup of 10
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    run()

    val out = spark.read.parquet(s"$base/out")
      .select("doc_id", "dup_of").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(10L) == -1L)
    assert(out(11L) == 10L)
  }
}

package graft

import java.nio.file.{Files, Paths}

/**
 * The ANN training memoization must be keyed on the corpus SNAPSHOT, not
 * the directory path: a long-lived session that rewrites a corpus dir
 * (compaction, re-ingest — exactly what VaultSink does to vault dirs)
 * must retrain instead of silently serving stale centroids/codebooks.
 */
class AnnCacheSpec extends SparkSpec {

  test("rewriting a corpus dir invalidates the memoized trainings") {
    val src = "/root/testdata/sf0.001"
    val work = Files.createTempDirectory("graft_anncache_").toString
    try {
      // corpus copy v1: first 400 vectors
      val emb = Tables(spark, src, "embeddings")
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 400)
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")

      val a1 = OpsQueries.ivfCentsFor(spark, work)
      val a2 = OpsQueries.ivfCentsFor(spark, work)
      assert(a1 eq a2, "same snapshot must hit the cache (same instance)")
      val b1 = OpsQueries.pqBooksFor(spark, work)
      assert(OpsQueries.pqBooksFor(spark, work) eq b1)

      // rewrite the SAME path with different content (fewer vectors —
      // different file sizes, so the fingerprint changes even within
      // mtime granularity)
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 200)
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")

      val a3 = OpsQueries.ivfCentsFor(spark, work)
      assert(!(a3 eq a1), "rewritten corpus must retrain IVF centroids")
      val b3 = OpsQueries.pqBooksFor(spark, work)
      assert(!(b3 eq b1), "rewritten corpus must retrain PQ codebooks")
    } finally {
      graft.core.FsUtil.deleteRecursive(Paths.get(work))
    }
  }

  test("snapshot fingerprint tracks file count, mtime, and bytes") {
    val d = Files.createTempDirectory("graft_fp_")
    try {
      val f = d.resolve("a.bin")
      Files.write(f, Array[Byte](1, 2, 3))
      val fp1 = graft.core.FsUtil.snapshotFingerprint(d)
      Files.write(d.resolve("b.bin"), Array[Byte](4))
      val fp2 = graft.core.FsUtil.snapshotFingerprint(d)
      assert(fp1 != fp2, "added file must change the fingerprint")
      Files.delete(d.resolve("b.bin"))
      Files.write(f, Array[Byte](9, 9, 9, 9)) // same count, new bytes
      val fp3 = graft.core.FsUtil.snapshotFingerprint(d)
      assert(fp3 != fp1, "rewritten content must change the fingerprint")
      assert(graft.core.FsUtil.snapshotFingerprint(d.resolve("nope")) == "absent")
    } finally {
      graft.core.FsUtil.deleteRecursive(d)
    }
  }
}

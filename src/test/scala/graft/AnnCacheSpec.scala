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

  test("ivfpq layout fixture rebuilds when the source embeddings change") {
    // the cross-JVM fixture's _BUILT marker stores (snapshot fingerprint
    // + index params); a regenerated corpus must mismatch it and force a
    // rebuild — stale layout vs stale stored answers can never pass
    val src = "/root/testdata/sf0.001"
    val work = Files.createTempDirectory("graft_layoutfp_").toString
    val fixDir = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_ivfpq_v2_${work.replaceAll("[^A-Za-z0-9.]", "_")}")
    try {
      val emb = Tables(spark, src, "embeddings")
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 400)
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      val q = SparkEntry.queries("q_ann_ivfpq_layout")
      assert(q(spark, work).collect().nonEmpty)
      val marker = fixDir.resolve("_BUILT")
      val tag1 = new String(Files.readAllBytes(marker), "UTF-8")
      // re-running on the unchanged corpus must NOT rebuild
      assert(q(spark, work).collect().nonEmpty)
      assert(new String(Files.readAllBytes(marker), "UTF-8") == tag1)
      // regenerate the corpus → tag must change (fixture rebuilt)
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 200)
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
      assert(q(spark, work).collect().nonEmpty)
      val tag2 = new String(Files.readAllBytes(marker), "UTF-8")
      assert(tag2 != tag1, "rewritten embeddings must rebuild the layout fixture")
    } finally {
      graft.core.FsUtil.deleteRecursive(Paths.get(work))
      graft.core.FsUtil.deleteRecursive(fixDir)
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

package graft.ops

import org.apache.spark.sql.SparkSession

/** Times BPE training's two merge-loop placements at a given merge
  * count: the driver-local hybrid path (default train) vs the
  * distributed per-merge-job loop — the SCALING.md evidence for the
  * hybrid (sbt "runMain graft.DiagBpe 1000 [dist]"). */
object DiagBpe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val alsoDist = args.length > 1 && args(1) == "dist"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val m = Bpe.train(docs, nMerges = n)
    val tLocal = (System.nanoTime() - t0) / 1e9
    println(f"[bpe] hybrid(local) nMerges=$n -> ${m.size} merges in $tLocal%.2f s")
    if (alsoDist) {
      val vocab = Bpe.vocabOf(docs, "text")
      val t1 = System.nanoTime()
      val md = Bpe.trainDistributed(vocab, n)
      val tDist = (System.nanoTime() - t1) / 1e9
      println(f"[bpe] distributed nMerges=$n -> ${md.size} merges in $tDist%.2f s")
      println(s"[bpe] equal: ${m == md}")
    }
    spark.stop()
  }
}

package graft

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Isolates the cost components of the IVF+PQ layout BUILD on the 1000×
 * embeddings corpus (2M vectors): cell assignment at 64 vs 256
 * centroids, PQ encode, and the fused assign+encode+pack projection —
 * to find which component made the 256-cell fixture build run at
 * ~30 ms/row (round-11 observation) when its arithmetic is ~20k flops.
 *
 * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.DiagAnnBuild"
 */
object DiagAnnBuild {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val amp = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED1000_DIR",
      "/tmp/graft_sf100_documents")
    val emb = Tables(spark, amp, "embeddings")
    println(s"[diag-ann] corpus rows: ${emb.count()}")

    // deterministic fake centroids — shape-identical to trained ones;
    // the experiment measures expression cost, not quantizer quality
    def fakeCents(n: Int): Array[(Int, Array[Double])] =
      Array.tabulate(n)(c => (c, Array.tabulate(64)(d => ((c * 64 + d) % 97) / 97.0)))

    def time(label: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[diag-ann] $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    val books = OpsQueries.pqBooksFor(spark, amp) // cached on disk? no — retrains; measure it
    println("[diag-ann] pq books ready")

    time("scan_only")(emb.select(col("vec_id")))
    time("assign_64")(Similarity.assignCells(emb, fakeCents(64)).select(col("vec_id"), col("cell")))
    time("assign_256")(Similarity.assignCells(emb, fakeCents(256)).select(col("vec_id"), col("cell")))
    time("encode_only")(Similarity.pqEncode(emb, books).select(col("vec_id"), col("codes")))
    time("fused_64")(
      Similarity.pqEncode(Similarity.assignCells(emb, fakeCents(64)), books)
        .select(col("vec_id"), col("cell"), Similarity.pqPack(col("codes"), books.length).as("packed")))
    time("fused_256")(
      Similarity.pqEncode(Similarity.assignCells(emb, fakeCents(256)), books)
        .select(col("vec_id"), col("cell"), Similarity.pqPack(col("codes"), books.length).as("packed")))
    spark.stop()
  }
}

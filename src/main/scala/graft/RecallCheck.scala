package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: ANN recall vs brute force per sf (bounds for the
  * q_ann_* accuracy-contract oracles). */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables(spark, s"/root/testdata/$sf", "embeddings")
      val queries = emb.where(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select(col("query_id").as("eq"), col("neighbor_id").as("en"))
      def recall(ann: org.apache.spark.sql.DataFrame): Double = {
        val hits = ann.select("query_id", "neighbor_id")
          .join(exact, col("query_id") === col("eq") && col("neighbor_id") === col("en"), "left_semi")
          .count()
        hits.toDouble / (10 * 5)
      }
      val lsh = recall(Similarity.annTopK(emb, queries, k = 5))
      val (indexed, cents) = Similarity.ivfIndex(emb, nCells = 16, lloydIters = 2)
      val ivf = recall(Similarity.ivfTopK(indexed, cents, queries, k = 5, nProbe = 4))
      println(s"RECALL $sf lsh=$lsh ivf=$ivf")
    }
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`ARRAY<FLOAT>`).
 *
 * - Brute-force cosine top-k: correctness baseline. The query set is
 *   broadcast (it is small by construction); the corpus is scanned once,
 *   fully parallel, no shuffle of the corpus — only the per-partition
 *   top-k rows move. At 100 TB this is a map + windowed top-k.
 * - LSH-bucketed (random hyperplane / sign-LSH) ANN: hash each vector to a
 *   `nBits`-bit signature with DETERMINISTIC pseudo-random hyperplanes
 *   (hash-derived, no RNG state); candidates = same-bucket pairs,
 *   probed buckets shrink the scan by ~2^nBits.
 *
 * Dot products use double-precision sequential folds (`aggregate` over
 * `zip_with`) — deterministic and codegen'd, matching the SQL oracle
 * bit-for-bit.
 */
object Similarity {

  /** Deterministic double fold: Σ a_i*b_i in element order, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest corpus
   * vectors. `queries` must be small (broadcast). Ties break on corpus id.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /**
   * Deterministic pseudo-random hyperplane component for (plane, dim):
   * maps a hash to [-1, 1). Stable across engines and runs (no RNG).
   */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((plane, dim))
    (h.toDouble / Int.MaxValue.toDouble)
  }

  /** Sign-LSH bucket id: nBits-bit signature from hyperplane sign tests. */
  def lshBucket(vec: Column, nBits: Int, dims: Int): Column = {
    val bits = (0 until nBits).map { p =>
      val planeLit = array((0 until dims).map(d => lit(planeComponent(p, d))): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * ANN via sign-LSH: group corpus into 2^nBits buckets; per query, scan
   * only its bucket (plus optional 1-bit-flip probes) and rank by cosine.
   * Bucket assignment is a narrow map; the search joins on bucket id.
   */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 8, dims: Int = 64,
              multiProbe: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      lshBucket(col(vecCol), nBits, dims).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      lshBucket(col(vecCol), nBits, dims).as("qbucket"))
    // multi-probe: query probes its own bucket plus all 1-bit flips
    val probes = if (multiProbe) {
      val flips = (0 until nBits).map(b => col("qbucket").bitwiseXOR(lit(1L << b)))
      qb.withColumn("bucket", explode(array(col("qbucket") +: flips: _*)))
    } else qb.withColumn("bucket", col("qbucket"))
    val scored = c.join(broadcast(probes), "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}

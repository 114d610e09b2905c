package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
 *
 * Scale design (100 TB):
 *  - exact dedup is a single hash-aggregate on a 32-char fingerprint (not
 *    the full text) — the shuffle moves 32 bytes + key per row, not
 *    documents;
 *  - minhash signatures are computed NARROW (array_min over a transform —
 *    no explode, no shuffle); only the banded LSH bucket-join shuffles,
 *    and it shuffles (band_id, band_sig) pairs, i.e. O(#docs × #bands)
 *    small rows;
 *  - candidate verification (exact Jaccard) touches only bucket-colliding
 *    pairs, never the full cross product.
 *
 * MinHash uses md5(seed || shingle) as the per-seed hash family —
 * deterministic, engine-portable, and uniformly distributed; min is taken
 * over the hex strings (order-isomorphic to the 128-bit value).
 */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical (normalized) text. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature: k columns mh0..mh(k-1), computed without a shuffle. */
  def minhashSignature(text: Column, k: Int, shingleN: Int = 3): Seq[Column] = {
    val sh = TextAnalysis.shingles(text, shingleN)
    (0 until k).map { seed =>
      array_min(transform(sh, s => md5(concat(lit(s"$seed#"), s)))).as(s"mh$seed")
    }
  }

  def withMinhash(docs: DataFrame, k: Int = 8, textCol: String = "text"): DataFrame =
    docs.select(col("*") +: minhashSignature(col(textCol), k): _*)

  /**
   * LSH banding: k minhashes → `bands` bands of `rowsPerBand`; docs sharing
   * any band signature are candidate near-dups. Returns (band, band_sig,
   * doc_id) — group/self-join on (band, band_sig) yields candidates.
   */
  def lshBands(sig: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val rowsPerBand = k / bands
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), md5(concat(cols: _*)).as("band_sig"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band"), col("bs.band_sig"))
  }

  /** Candidate near-dup pairs from LSH buckets (id_a < id_b, distinct). */
  def lshCandidates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                    k: Int = 8, bands: Int = 4): DataFrame = {
    val bandsDf = lshBands(withMinhash(docs, k, textCol), idCol, k, bands)
    val a = bandsDf.as("a")
    val b = bandsDf.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig")
        && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /**
   * SimHash: 32-bit signature from per-token hashes; Hamming-close
   * signatures ⇒ similar documents. Uses md5-hex → first 8 hex chars as
   * the token hash (portable). Bit-vote accumulation is a narrow
   * aggregate over the token array.
   */
  def simhash(text: Column): Column = {
    val ws = TextAnalysis.tokens(text)
    // per token: 32-bit value from md5 prefix
    val hashes = transform(ws, w => conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    val bitVotes = (0 until 32).map { bit =>
      val mask = 1L << bit
      // vote = (#tokens with bit set) - (#tokens with bit clear)
      val set = aggregate(hashes, lit(0L),
        (acc, h) => acc + when((h.bitwiseAND(lit(mask))) =!= 0L, 1L).otherwise(-1L))
      when(set > 0, lit(mask)).otherwise(lit(0L))
    }
    bitVotes.reduce(_ + _).cast("long")
  }

  /** Hamming distance between two simhash longs (bit_count of xor). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * Exact n-gram Jaccard similarity for candidate pairs: |A∩B|/|A∪B| over
   * distinct word n-gram shingles. Used to verify LSH candidates; at scale
   * only runs on the candidate set, never all pairs.
   */
  def jaccardVerify(candidates: DataFrame, docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), array_distinct(TextAnalysis.shingles(col(textCol), shingleN)).as("sh"))
    candidates
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"), round(col("inter") / col("uni"), 6).as("jaccard"))
  }
}

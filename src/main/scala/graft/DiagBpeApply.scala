package graft

import graft.ops.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * A/B of the BPE apply stage: nested-replace state encoding
 * ([[Bpe.tokenCountAfter]]) vs the memoized per-word counter
 * ([[Bpe.tokenCountFast]]), at sf0.1 / 100× / 1000× — the apply stage is
 * ~88 s of q_bpe_tokens' 92 s third-decade row. Also asserts the two
 * forms agree on every doc at sf0.1 before timing anything (a fast wrong
 * answer is not a win).
 *
 *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.DiagBpeApply [100x] [1000x]"
 */
object DiagBpeApply {
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

    val sf01 = "/root/testdata/sf0.1"
    val amp100 = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED100_DIR", "/tmp/graft_sf10_documents")
    val amp1000 = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED1000_DIR", "/tmp/graft_sf100_documents")
    ScaleBench.amplify(spark, sf01, amp100, factor = 100, tables = Seq("documents"))
    ThirdDecade.amplify1000(spark, sf01, amp1000, factor = 1000)

    val merges = Bpe.train(Tables(spark, sf01, "documents"), nMerges = R8Queries.BpeMerges)

    // equality first: every sf0.1 doc, both forms
    val docs01 = Tables(spark, sf01, "documents")
    val diff = docs01.select(col("doc_id"),
        Bpe.tokenCountAfter(col("text"), merges).as("slow"),
        Bpe.tokenCountFast(col("text"), merges).as("fast"))
      .where(col("slow") =!= col("fast"))
    val nDiff = diff.count()
    require(nDiff == 0, {
      val ex = diff.limit(5).collect().mkString("; ")
      s"BPE fast form diverges on $nDiff docs: $ex"
    })
    println("[bpe] equality held on every sf0.1 doc")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def count(dir: String, fast: Boolean): DataFrame = {
      val f = if (fast) Bpe.tokenCountFast _ else Bpe.tokenCountAfter _
      Tables(spark, dir, "documents")
        .select(col("doc_id"), f(col("text"), merges).as("n_bpe"))
    }

    // warm both shapes
    noop(count(sf01, fast = false)); noop(count(sf01, fast = true))
    for ((label, dir) <- Seq("sf0.1" -> sf01, "100x" -> amp100, "1000x" -> amp1000)
         if label == "sf0.1" || args.isEmpty || args.contains(label)) {
      val s1 = time(noop(count(dir, fast = false)))
      val f1 = time(noop(count(dir, fast = true)))
      val s2 = time(noop(count(dir, fast = false)))
      val f2 = time(noop(count(dir, fast = true)))
      val s = math.min(s1, s2); val f = math.min(f1, f2)
      println(f"[bpe] $label apply nested-replace=$s%.2fs (runs $s1%.2f/$s2%.2f) " +
        f"memoized=$f%.2fs (runs $f1%.2f/$f2%.2f) ratio=${f / s}%.2f")
    }

    // r15 verdict task 5 (measured half): the memo's WORST case — a
    // high-entropy vocabulary where every word occurrence is globally
    // unique, so once the 2^20 fill-once cap saturates the hit rate is
    // 0% and every doc pays O(merges x wordLen) uncached. Corpus:
    // sf0.1 (or 100x with the arg) with each word suffixed by
    // (doc_id, position) — same doc/word geometry as the memo-friendly
    // corpus above, different only in vocabulary entropy; compare the
    // [bpe] rows directly. Expect the saturation WARN once per executor.
    if (args.contains("highentropy")) {
      def hiEntropy(dir: String): DataFrame = {
        // prime modulus: the amplification key-shift (10^8) must not
        // divide it, or every copy would reuse the base's suffixes and
        // the vocabulary would stop growing with the corpus. The suffix
        // must be LETTERS (translate digits) — BPE symbols are [a-z]
        // runs, so digit suffixes would split into a tiny run vocabulary
        // instead of a high-entropy one.
        def letters(c: org.apache.spark.sql.Column) =
          translate(c.cast("string"), "0123456789", "qwertyuiop")
        Tables(spark, dir, "documents").select(col("doc_id"),
          array_join(transform(split(col("text"), " "),
            (t, i) => concat(t, letters(col("doc_id") % 999983L), letters(i))), " ")
            .as("text"))
      }
      val heDir = if (args.contains("100x")) amp100 else sf01
      val heLabel = if (args.contains("100x")) "100x" else "sf0.1"
      val docs = hiEntropy(heDir)
      def heCount(fast: Boolean): DataFrame = {
        val f = if (fast) Bpe.tokenCountFast _ else Bpe.tokenCountAfter _
        docs.select(col("doc_id"), f(col("text"), merges).as("n_bpe"))
      }
      noop(heCount(fast = true)) // warm + saturate the memo
      val h1 = time(noop(heCount(fast = true)))
      val n1 = time(noop(heCount(fast = false)))
      val h2 = time(noop(heCount(fast = true)))
      val n2 = time(noop(heCount(fast = false)))
      println(f"[bpe] $heLabel HIGH-ENTROPY apply memoized=${math.min(h1, h2)}%.2fs " +
        f"(runs $h1%.2f/$h2%.2f) nested-replace=${math.min(n1, n2)}%.2fs " +
        f"(runs $n1%.2f/$n2%.2f) — memo saturated, hit rate ~0%%")
    }
    spark.stop()
  }
}

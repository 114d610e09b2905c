package graft

import graft.ops.{Bpe, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Second-decade scaling sweep for the operators that postdate the 100×
 * harness (round-9 verdict #4/#5): span dedup, PPJoin, and BPE training
 * at 10×/100× key-shifted amplifications of sf0.1's documents table,
 * plus driver-local BPE merge-loop timings at production merge counts.
 *
 * Protocol mirrors DeepScaleBench: one warmup at sf0.1 JITs every
 * pipeline; then min-of-2 timed runs at the cheap points and ONE timed
 * run at the expensive ones (q_dup_spans/ppjoin_composed/bpe_hybrid at
 * 100×, and ppjoin_raw / bpe_distributed at 10× — minutes each; a
 * second run buys noise margin a log-log slope doesn't need). Single-
 * run rows are single samples — read them as order-of-magnitude.
 *
 * PPJoin is measured two ways on purpose:
 *  - RAW on the amplified sample (10× only): amplification duplicates
 *    every text, so the ANSWER SET itself grows ~quadratically in the
 *    duplication factor (C(10,2)/copy-group). A correct exact algorithm
 *    cannot be linear in an output that isn't — the row measures how
 *    the prefix filter absorbs duplicate saturation, not linearity.
 *  - COMPOSED as collapse→ppJoin (10× and 100×): the production
 *    pipeline runs exact dedup first, which collapses the copy groups
 *    and keeps the output linear — this is the row the 100-TB scale
 *    claim rests on.
 *
 * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleSweepR10"
 * Output: one JSON line + SCALING_R10.json.
 */
object ScaleSweepR10 {

  /** Synthetic ≥n-distinct-word vocab in trainLocal's (freq, state)
    * shape: deterministic LCG, zipf-ish freqs, 5-10 lowercase chars.
    * Random words means early merges combine common bigrams — the
    * realistic tokenizer-training regime. */
  def syntheticVocab(n: Int): Seq[(Long, String)] = {
    var state = 0x9e3779b97f4a7c15L
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    (0 until n).map { i =>
      val len = 5 + (math.abs(next()) % 6).toInt
      val w = new String((0 until len).map(_ => ('a' + (math.abs(next()) % 26)).toChar).toArray)
      val freq = 1L + (n.toLong / (i + 1)) // zipf-ish
      (freq, " " + w.toCharArray.mkString("  ") + " ")
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val amp10 = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED_DIR", "/tmp/graft_sf1_amplified")
    val amp100 = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED100_DIR", "/tmp/graft_sf10_documents")
    ScaleBench.amplify(spark, "/root/testdata/sf0.1", amp10, factor = 10,
      tables = Seq("documents"))
    ScaleBench.amplify(spark, "/root/testdata/sf0.1", amp100, factor = 100,
      tables = Seq("documents"))

    def docs(dir: String) = Tables(spark, dir, "documents")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // (name, dir-label, builder). Builders re-read per run.
    val sf01 = "/root/testdata/sf0.1"
    def spans(dir: String): DataFrame =
      Dedup.duplicateSpans(docs(dir), windowTokens = R8Queries.DupSpanWindow)
    def ppRaw(dir: String): DataFrame =
      Dedup.ppJoin(docs(dir).where(col("doc_id") % R8Queries.PpJoinMod === 0),
        threshold = R8Queries.PpJoinThreshold)
    def ppComposed(dir: String): DataFrame = {
      // production composition: exact-collapse the sample, then ppJoin
      val sample = docs(dir).where(col("doc_id") % R8Queries.PpJoinMod === 0)
      Dedup.ppJoin(Dedup.collapseExact(sample, "doc_id", "text", None),
        threshold = R8Queries.PpJoinThreshold)
    }
    def bpeHybrid(dir: String): Unit =
      { Bpe.train(docs(dir), nMerges = R8Queries.BpeMerges); () }
    def bpeDistributed(dir: String): Unit =
      { Bpe.train(docs(dir), nMerges = R8Queries.BpeMerges,
          localVocabThreshold = 0L); () }

    val rows = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
    def run(name: String, scale: String, once: Boolean)(body: => Unit): Unit = {
      val a = time(body)
      val s = if (once || a < 0) a else math.min(a, time(body))
      println(f"[sweep] $name%s @$scale%s: $s%.2fs")
      rows += ((name, scale, s))
    }

    // warmups at sf0.1 (JIT + codegen for every pipeline under test)
    noop(spans(sf01)); noop(ppRaw(sf01)); noop(ppComposed(sf01))
    bpeHybrid(sf01); bpeDistributed(sf01)

    run("q_dup_spans", "1x", once = false)(noop(spans(sf01)))
    run("q_dup_spans", "10x", once = false)(noop(spans(amp10)))
    run("q_dup_spans", "100x", once = true)(noop(spans(amp100)))

    run("ppjoin_raw", "1x", once = false)(noop(ppRaw(sf01)))
    run("ppjoin_raw", "10x", once = true)(noop(ppRaw(amp10)))

    run("ppjoin_composed", "1x", once = false)(noop(ppComposed(sf01)))
    run("ppjoin_composed", "10x", once = false)(noop(ppComposed(amp10)))
    run("ppjoin_composed", "100x", once = true)(noop(ppComposed(amp100)))

    run("bpe_train_hybrid", "1x", once = false)(bpeHybrid(sf01))
    run("bpe_train_hybrid", "10x", once = false)(bpeHybrid(amp10))
    run("bpe_train_hybrid", "100x", once = true)(bpeHybrid(amp100))

    run("bpe_train_distributed", "1x", once = false)(bpeDistributed(sf01))
    run("bpe_train_distributed", "10x", once = true)(bpeDistributed(amp10))

    // ── driver-local merge loop at production merge counts ────────────
    // (generator shared with BpeLocalBench; the claim "a production
    // tokenizer run is minutes driver-local" was extrapolated from 89
    // merges — these rows measure it)
    val vocab100k = syntheticVocab(100000)
    for (m <- Seq(1000, 10000)) {
      val t = time { Bpe.trainLocal(vocab100k, m); () }
      println(f"[sweep] bpe_local_${m}%d_merges @100k-vocab: $t%.2fs")
      rows += ((s"bpe_local_${m}_merges", "100k_vocab", t))
    }

    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json = rows.map { case (n, sc, s) => "\"" + n + "@" + sc + "\":" + fmt(s) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"scaling_r10","unit":"sec","queries":$json}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("SCALING_R10.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}

package graft

import graft.ops.Bpe

/**
 * Driver-local BPE merge-loop bench at production merge counts — no
 * Spark session, pure JVM. Times [[Bpe.trainLocal]] (incremental
 * pair-count maintenance) on the ScaleSweepR10 synthetic 100k-word
 * vocab at nMerges = 1000 / 10000 / 30000, the counts a real tokenizer
 * run uses. The round-10 "before" number for the same 1000-merge row
 * with the naive full-rescan loop is 193.6 s (SCALING_R10.json) — the
 * delta is what justifies the incremental bookkeeping.
 *
 * Run: sbt "runMain graft.BpeLocalBench"
 * Output: one JSON line + BPE_LOCAL.json.
 */
object BpeLocalBench {
  def main(args: Array[String]): Unit = {
    val vocab = ScaleSweepR10.syntheticVocab(100000)
    Bpe.trainLocal(vocab, 200) // JIT warmup
    val rows = Seq(1000, 10000, 30000).map { m =>
      val t0 = System.nanoTime()
      val merges = Bpe.trainLocal(vocab, m)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-local] nMerges=$m%d: $t%.2fs (${merges.size}%d merges learned)")
      (m, merges.size, t)
    }
    val json = rows.map { case (m, got, t) =>
      s""""$m":{"sec":${"%.3f".formatLocal(java.util.Locale.ROOT, t)},"learned":$got}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"bpe_local","vocab":100000,"loop":"incremental+lazy-heap","queries":$json}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BPE_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
  }
}

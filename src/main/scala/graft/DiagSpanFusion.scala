package graft

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * A/B of [[Dedup.duplicateSpans]]' FUSED window-count form against the
 * default aggregate+join-back, at 100× and 1000× amplification — the
 * r14 stage profile's "lever (b)", measured instead of guessed (r15
 * verdict task 5). The fused form trades the dup-aggregate exchange AND
 * the join-back exchange (plus the 1B-row localCheckpoint that exists
 * only to share the scan between them) for one exchange + in-partition
 * sort; the profile priced the replaced exchanges at ~25% of the CPU,
 * so the win (if any) should come from the vanished checkpoint
 * materialization as much as the exchange.
 *
 * Protocol: the dup-span family env (SCALING.md r14) —
 *   SPARK_DRIVER_MEM=16g SPARK_GRAFT_SHUFFLE=64 SPARK_GRAFT_CPUS=32
 *     sbt "runMain graft.DiagSpanFusion"
 * One sf0.1 warmup per arm, then alternating timed runs (default,
 * fused, default, fused) per scale so window drift hits both arms.
 * Prints seconds only — the A/B never merges into SCALING_1000.json
 * (adoption, if measured, changes the registered query instead).
 */
object DiagSpanFusion {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val heapGb = Runtime.getRuntime.maxMemory.toDouble / (1L << 30)
    if (heapGb > 24)
      println(f"[fusion] WARN: heap $heapGb%.0fg exceeds the family's 16g protocol " +
        "(2-3x pessimization, SCALING.md r14) — ratios may not transfer")

    val sf01 = "/root/testdata/sf0.1"
    val amp100 = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED100_DIR", "/tmp/graft_sf10_documents")
    ScaleBench.amplify(spark, sf01, amp100, factor = 100, tables = Seq("documents"))
    val amp1000 = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED1000_DIR", "/tmp/graft_sf100_documents")
    ThirdDecade.amplify1000(spark, sf01, amp1000, factor = 1000)

    val stripMode = args.contains("strip")
    // "rolling" mode: the A/B axis becomes the window-hash
    // materialization (md5 vs the codegen'd two-poly rolling pass),
    // both arms on the fused window-count shape
    val rollingMode = args.contains("rolling")
    def spans(dir: String, arm: Boolean): DataFrame = {
      val (fused, rolling) =
        if (rollingMode) (true, arm) else (arm, false)
      if (stripMode)
        Dedup.stripDuplicateSpans(Tables(spark, dir, "documents"),
          windowTokens = R8Queries.DupSpanWindow,
          fuseWindowCount = fused, rollingHash = rolling)
      else
        Dedup.duplicateSpans(Tables(spark, dir, "documents"),
          windowTokens = R8Queries.DupSpanWindow,
          fuseWindowCount = fused, rollingHash = rolling)
          .orderBy("doc_id", "span_start")
    }
    // r15 advice: a failed arm must not flow into min/ratio as a
    // sentinel (−1 would report the FAILED arm as the faster one)
    def time(body: => Unit): Option[Double] = {
      val t0 = System.nanoTime()
      try { body; Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[fusion] FAILED: ${e.getMessage}"); None }
    }
    def fmt(o: Option[Double]): String = o.fold("FAIL")(v => f"$v%.1f")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val what = (if (stripMode) "strip" else "spans") + (if (rollingMode) "-rollingAB" else "")
    if (args.contains("fusedonly")) {
      // env-robustness probe: the fused form under whatever env this JVM
      // got (e.g. the 64g/256 default that pessimizes the checkpointed
      // form 2-3x) — warm at sf0.1, two timed 1000x runs
      noop(spans(sf01, arm = true))
      val f1 = time(noop(spans(amp1000, arm = true)))
      val f2 = time(noop(spans(amp1000, arm = true)))
      val best = (f1.toSeq ++ f2.toSeq).minOption
      println(f"[fusion] $what fusedonly 1000x heap=$heapGb%.0fg shuffle=$shuffleParts " +
        s"runs ${fmt(f1)}/${fmt(f2)} min=${best.fold("FAIL")(v => f"$v%.1f")}s")
      spark.stop(); return
    }
    // warmup both plan shapes (JIT + codegen)
    noop(spans(sf01, arm = false)); noop(spans(sf01, arm = true))

    for ((label, dir) <- Seq("100x" -> amp100, "1000x" -> amp1000)
         if args.forall(a => a == "strip" || a == "rolling" || a == label) || args.contains(label)) {
      // alternating arms: drift lands on both
      val d1 = time(noop(spans(dir, arm = false)))
      val f1 = time(noop(spans(dir, arm = true)))
      val d2 = time(noop(spans(dir, arm = false)))
      val f2 = time(noop(spans(dir, arm = true)))
      val d = (d1.toSeq ++ d2.toSeq).minOption
      val f = (f1.toSeq ++ f2.toSeq).minOption
      val ratio = for (fv <- f; dv <- d) yield fv / dv
      println(s"[fusion] $what $label default=${d.fold("FAIL")(v => f"$v%.1f")}s " +
        s"(runs ${fmt(d1)}/${fmt(d2)}) fused=${f.fold("FAIL")(v => f"$v%.1f")}s " +
        s"(runs ${fmt(f1)}/${fmt(f2)})" +
        ratio.fold(" ratio=N/A (an arm failed)")(r => f" ratio=$r%.2f"))
    }
    spark.stop()
  }
}

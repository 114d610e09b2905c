package graft

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Heavy-hitter skew A/B for the dup-span family (r15 verdict task 1):
 * the uniform ×N amplification duplicates every window hash equally, so
 * it CANNOT represent the operator's actual target input — a boilerplate
 * window shared by a large fraction of documents, which lands on ONE
 * task of the fused `partitionBy(h)` window (no map-side combine, and
 * AQE cannot split a WindowExec partition).
 *
 * Fixture (deterministic, marker-guarded): sf0.1 documents ×factor,
 * every token carrying a per-copy suffix so ordinary windows are
 * SINGLETONS (the realistic corpus shape — uniform amplification makes
 * every hash a duplicate), plus
 *   - planted cross-doc dup paragraphs: docs with key % 50 == 0 append
 *     one of 37 pool paragraphs (27 tokens → 20 dup windows each, count
 *     ≈ docs/50/37 — "warm" repeated hashes, below any hot threshold);
 *   - a heavy hitter: docs with key % (100/hotPct) == 1 append the same
 *     27-token single-token boilerplate — all 20 of its windows are ONE
 *     hash, so hotPct=50 at factor 1000 piles ~50M rows of one hash
 *     onto one window task.
 *
 * Arms (all rollingHash=true so the axis is purely the count shape):
 *   fused  — `count(1).over(partitionBy(h))`, the r15 default
 *   legacy — checkpoint + aggregate + join-back (AQE-splittable join)
 *   guard  — fused + sampled hot-set salt routing (SpanSkewGuard)
 *
 * Usage (dup-span family env protocol):
 *   SPARK_DRIVER_MEM=16g SPARK_GRAFT_SHUFFLE=64 SPARK_GRAFT_CPUS=32 \
 *     sbt "runMain graft.DiagSpanSkew [strip] [100x|1000x] [hot0|hot10|hot50|hot100|uniform|tail20k] [fused|legacy|guard|guardall|restricted ...]"
 * Prints seconds; never merges into SCALING_1000.json.
 */
object DiagSpanSkew {
  private val Shift = 100000000L

  /** Build the skewed corpus at `outDir/documents.parquet` (marker-guarded).
    * `tailFam` > 0 (r18, VERDICT r17 task 3) additionally appends to EVERY
    * doc one of `tailFam` distinct 27-token "templated boilerplate family"
    * paragraphs (chosen by key % tailFam) — tailFam=1000 yields 20,000
    * distinct repeated window hashes, each with docs/tailFam occurrences:
    * a deep WARM tail (each family far below the detection threshold),
    * the shape where the old fixed flag cap would have mattered. */
  def buildFixture(spark: SparkSession, srcDir: String, outDir: String,
                   factor: Int, hotPct: Int, tailFam: Int = 0): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val out = java.nio.file.Paths.get(outDir, "documents.parquet")
    val marker = java.nio.file.Paths.get(outDir, "documents.parquet.marker")
    val srcFp = graft.core.FsUtil.snapshotFingerprint(
      java.nio.file.Paths.get(srcDir, "documents.parquet"))
    val want = s"factor=$factor;hotPct=$hotPct;src=$srcFp;v=1" +
      (if (tailFam > 0) s";tail=$tailFam" else "")
    val upToDate = java.nio.file.Files.exists(out) &&
      java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim == want
    if (upToDate) return

    val pool = (0 until 37).map(i =>
      (0 until 27).map(j => s"dupseg${i}w$j").mkString(" "))
    val poolArr = array(pool.map(lit): _*)
    val boiler = Seq.fill(27)("zzboilerplate").mkString(" ")

    val df = spark.read.parquet(s"$srcDir/documents.parquet")
      .select("doc_id", "text")
      .withColumn("__copy", explode(sequence(lit(0L), lit(factor - 1L))))
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("key", col("doc_id") + col("__copy") * Shift)
      // per-copy token suffix: every ordinary window hash is unique to
      // its copy — the singleton-dominated shape of a real corpus
      .withColumn("t1", array_join(
        transform(split(col("text"), " "),
          t => concat(t, lit("c"), col("__copy"))), " "))
      .withColumn("t2", when(col("key") % 50 === 0,
        concat(col("t1"), lit(" "),
          element_at(poolArr, (col("key") % 37).cast("int") + 1)))
        .otherwise(col("t1")))
      .withColumn("t3",
        if (hotPct <= 0) col("t2")
        else if (hotPct >= 100) // hot100: EVERY doc carries the boilerplate
          concat(col("t2"), lit(" "), lit(boiler))
        else when(col("key") % (100 / hotPct) === 1,
          concat(col("t2"), lit(" "), lit(boiler))).otherwise(col("t2")))
      .withColumn("t4",
        if (tailFam <= 0) col("t3")
        else concat(col("t3"), lit(" "), array_join(
          transform(sequence(lit(0), lit(26)),
            j => concat(lit("tailfam"), col("key") % tailFam, lit("w"), j)), " ")))
      .select(col("key").as("doc_id"), col("t4").as("text"))
    df.write.mode("overwrite").parquet(out.toString)
    java.nio.file.Files.write(marker, (want + "\n").getBytes("UTF-8"))
    ()
  }

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
      println(f"[skew] WARN: heap $heapGb%.0fg exceeds the family's 16g protocol")

    val sf01 = "/root/testdata/sf0.1"
    val stripMode = args.contains("strip")
    val scales = Seq("100x" -> 100, "1000x" -> 1000)
      .filter { case (l, _) => !args.exists(_.endsWith("00x")) || args.contains(l) }
    // "uniform" = the registered bench fixtures (ScaleBench/ThirdDecade
    // key-shift amplification, every hash duplicated xN) — the arm that
    // decides whether a shape change may touch the REGISTERED rows
    // hot100 (r16 verdict): every doc carries the boilerplate — ~1e8
    // occurrences of ONE hash at 1000x, the next decade above hot50's
    // ~5e7, where the fused-vs-guard crossover claim was extrapolated
    // tail20k (r18): 1000 templated boilerplate families on every doc =
    // 20k distinct repeated window hashes, each docs/1000 occurrences —
    // a deep WARM tail below any detection threshold. Decides (a)
    // whether an unguarded warm tail straggles the fused window and (b)
    // what force-flagging all 20k (arm "guardall") costs.
    val hots = Seq("hot0" -> 0, "hot10" -> 10, "hot50" -> 50,
                   "hot100" -> 100, "uniform" -> -1, "tail20k" -> -2)
      .filter { case (l, _) =>
        !args.exists(a => a.startsWith("hot") || a == "uniform" || a == "tail20k") ||
          args.contains(l) }
    // "fused_oldisl": the fused count shape with the pre-r16 relational
    // island pass — alternates IN-JVM against "fused" so the island-axis
    // A/B is drift-robust (sequential JVM invocations measured 2x apart
    // in one ambient swing)
    // "hashagg": the r17 experimental count shape — same h-keyed
    // exchange consumed by a hash aggregate (collect_list group state)
    // instead of the WindowExec sort. Only meaningful with
    // SPARK_GRAFT_OHA_THRESHOLD raised past the per-partition group
    // count, else ObjectHashAggregate falls back to sort-based and the
    // shape degenerates to the window's economics.
    // "guardall" (r18): detection sensitivity forced to ~zero share so
    // EVERY repeated hash in the sample flags hot — the cost ceiling of
    // the guard's broadcast + salt routing on a many-hot-hash corpus.
    // "restricted" (r19 rename of r18's "reuse"; strip only): the guarded
    // form with hotFirstAboveWindow=false — the pre-r18 restricted-pass
    // reference (hot canonical struct joined below the window + hot-only
    // corpus re-scan), the A/B baseline for the adopted above-window
    // default that "guard" now measures; in spans mode it degenerates to
    // "guard".
    // "fusedgc" (r19): fused + an explicit System.gc() at construction —
    // the control for the tail20k strip observation that the guard arm
    // read FASTER than its plan-identical fused sibling (plancheck:
    // sameResult=true, nothing flagged). Hypothesis: the guard's eager
    // sample pass (persist/unpersist + its own jobs) hands the big
    // window job a collected heap, and near the 16g spill threshold
    // that is worth more than the sample costs; each plain-fused run
    // instead inherits the previous arm's garbage. If fusedgc ~= guard,
    // the inversion is heap hygiene, not mechanism.
    // "sorted" (r19): the fused default PLUS the registered bench row's
    // trailing global orderBy (q_dup_spans sorts (doc_id, span_start);
    // strip sorts doc_id). The diag arms time the bare operator, the
    // SCALING_1000 registry times the SparkEntry query — this arm
    // measures the difference, which is exactly the wedge between the
    // r17 "fast-stretch 35-40 s" diag evidence and the registered 54.2.
    val allArms = Seq("fused", "fused_oldisl", "fusedgc", "legacy", "aggjoin", "guard",
                      "hashagg", "guardall", "restricted", "sorted")
    val armNames = allArms
      .filter(a => !args.exists(allArms.contains) || args.contains(a))

    sys.env.get("SPARK_GRAFT_OHA_THRESHOLD").foreach(t =>
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", t))

    def run(dir: String, arm: String): DataFrame = {
      val docs = Tables(spark, dir, "documents")
      // (fuseWindowCount, skewGuard, legacyCheckpoint)
      if (arm == "fusedgc") System.gc()
      val (fused, g, ckpt) = arm match {
        case "fused" | "fused_oldisl" | "fusedgc" | "hashagg" | "sorted" => (true, None, true)
        case "legacy"  => (false, None, true)
        case "aggjoin" => (false, None, false) // narrow agg + AQE join-back, no checkpoint
        case "guard" | "restricted" => (true, Some(Dedup.SpanSkewGuard()), true)
        case "guardall" => (true, Some(Dedup.SpanSkewGuard(partitionShare = 1e-6)), true)
      }
      val islands = arm != "fused_oldisl" && !args.contains("oldislands")
      val base =
        if (stripMode)
          Dedup.stripDuplicateSpans(docs, windowTokens = R8Queries.DupSpanWindow,
            fuseWindowCount = fused, rollingHash = true, skewGuard = g,
            legacyCheckpoint = ckpt, islandAgg = islands,
            hashAggCount = arm == "hashagg",
            hotFirstAboveWindow = arm != "restricted")
        else
          Dedup.duplicateSpans(docs, windowTokens = R8Queries.DupSpanWindow,
            fuseWindowCount = fused, rollingHash = true, skewGuard = g,
            legacyCheckpoint = ckpt, islandAgg = islands,
            hashAggCount = arm == "hashagg")
      if (arm == "sorted") {
        if (stripMode) base.orderBy("doc_id")
        else base.orderBy("doc_id", "span_start")
      } else base
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Option[Double] = {
      val t0 = System.nanoTime()
      try { body; Some((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable =>
        System.err.println(s"[skew] FAILED: ${e.getMessage}"); None }
    }
    def fmt(o: Option[Double]): String = o.fold("FAIL")(v => f"$v%.1f")

    val what = if (stripMode) "strip" else "spans"
    for ((hotLabel, hotPct) <- hots; (scaleLabel, factor) <- scales) {
      val dir =
        if (hotPct == -1) { // registered bench fixtures
          if (factor == 100) {
            val d = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED100_DIR", "/tmp/graft_sf10_documents")
            ScaleBench.amplify(spark, sf01, d, factor = 100, tables = Seq("documents")); d
          } else {
            val d = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED1000_DIR", "/tmp/graft_sf100_documents")
            ThirdDecade.amplify1000(spark, sf01, d, factor = 1000); d
          }
        } else if (hotPct == -2) {
          val d = s"/tmp/graft_spanskew_${factor}x_tail20k"
          buildFixture(spark, sf01, d, factor, 0, tailFam = 1000); d
        } else {
          val d = s"/tmp/graft_spanskew_${factor}x_$hotLabel"
          buildFixture(spark, sf01, d, factor, hotPct); d
        }
      // "plancheck" (r19): no timing — adjudicate whether the default
      // guard's plan on THIS fixture equals the unguarded fused plan
      // (guard flagged nothing -> degenerate-identical) or carries the
      // salted scatter (guard flagged hot hashes). Settles questions
      // like the tail20k strip gap without inference from timings.
      if (args.contains("plancheck")) {
        val g = run(dir, "guard").queryExecution.optimizedPlan
        val f = run(dir, "fused").queryExecution.optimizedPlan
        val scatter = g.toString.contains("xxhash64")
        println(s"[skew] plancheck $what $scaleLabel $hotLabel: " +
          s"sameResult=${g.sameResult(f)} guardCarriesScatter=$scatter")
        ()
      } else {
      // warmup every arm's plan shape on a small same-shape fixture
      val warmDir = s"/tmp/graft_spanskew_1x_${if (hotPct == -1) "hot0" else hotLabel}"
      buildFixture(spark, sf01, warmDir, 1, math.max(0, hotPct),
        tailFam = if (hotPct == -2) 1000 else 0)
      armNames.foreach(a => noop(run(warmDir, a)))
      // two alternating passes per arm so window drift lands on all;
      // the second pass runs in REVERSE order (r19): the tail20k strip
      // sessions showed the first timed run after warmups systematically
      // lands slow, so a fixed order hands the first-listed arm a
      // structural penalty in min-of-2 — reversing gives every arm one
      // read in each position
      val t1 = armNames.map(a => a -> time(noop(run(dir, a))))
      val t2 = armNames.reverse.map(a => a -> time(noop(run(dir, a)))).reverse
      val best = armNames.map { a =>
        val runs = (t1.toMap.apply(a).toSeq ++ t2.toMap.apply(a).toSeq)
        a -> (runs.minOption, t1.toMap.apply(a), t2.toMap.apply(a))
      }
      val summary = best.map { case (a, (m, r1, r2)) =>
        s"$a=${m.fold("FAIL")(v => f"$v%.1f")}s(${fmt(r1)}/${fmt(r2)})"
      }.mkString(" ")
      println(s"[skew] $what $scaleLabel $hotLabel $summary")
      }
    }
    spark.stop()
  }
}

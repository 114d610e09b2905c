package graft

import graft.ops.{Bpe, Dedup}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Third-decade (1000×) scaling points for the headline corpus operators.
 * The 10×/100× sweeps (SCALING.md) measured two decades; this main adds
 * one more on a 5M-doc, ~6 GB amplification of sf0.1's documents table —
 * the largest corpus the sandbox disk comfortably holds — so the 100-TB
 * exponent claims rest on THREE measured decades, not an extrapolation
 * from two.
 *
 * Amplification is the same key-shift construction as ScaleBench.amplify
 * (every copy's doc_id shifted by i·10^8, texts byte-identical across
 * copies — worst case for dedup operators by design), but built with a
 * single explode(sequence(...)) instead of a factor-way union: at 1000
 * copies a union plan has 1000 branches to analyze, while the explode is
 * one narrow codegen'd operator.
 *
 * Protocol: one warmup per pipeline at sf0.1 (JIT + codegen), then ONE
 * timed run per 1000× row (these are minutes each; a log-log slope over
 * three decades doesn't need min-of-2 noise margin). Read single runs as
 * single samples. Output: SCALING_1000.json + stdout lines.
 *
 * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ThirdDecade"
 *
 * Env note (r14, measured — SCALING.md "dup-span third decade"): the
 * dup-span rows should run with SPARK_DRIVER_MEM=16g
 * SPARK_GRAFT_SHUFFLE=64. A 64 GB heap is a 2–3× PESSIMIZATION for
 * them — the 1B-row localCheckpoint churns ~30 GB of storage memory
 * (eviction + GC) where a small heap spills to disk at once and the
 * OS page cache serves the re-reads. The big-heap/256-part env remains
 * right for rows whose single tasks exceed a small executor heap.
 */
object ThirdDecade {

  /** Key-shifted explode amplification of one table. Idempotent PER
    * (factor, source snapshot): a `.marker` file next to the output
    * records both, and reuse is gated on it matching — a rerun with a
    * different factor, a changed source, or a stale /tmp fixture from an
    * aborted run REBUILDS instead of silently reusing the wrong corpus
    * (which would invalidate every recorded exponent). A pre-marker
    * fixture (unverifiable provenance) also rebuilds. */
  def amplify1000(spark: SparkSession, srcDir: String, outDir: String,
                  factor: Int, table: String = "documents"): Unit = {
    val shift = 100000000L // same per-copy key shift as ScaleBench.amplify
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val out = java.nio.file.Paths.get(outDir, s"$table.parquet")
    val marker = java.nio.file.Paths.get(outDir, s"$table.parquet.marker")
    val srcFp = graft.core.FsUtil.snapshotFingerprint(
      java.nio.file.Paths.get(srcDir, s"$table.parquet"))
    val want = s"factor=$factor;src=$srcFp"
    val upToDate = java.nio.file.Files.exists(out) &&
      java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim == want
    if (!upToDate) {
      val df = spark.read.parquet(s"$srcDir/$table.parquet")
      val keyCols = df.columns.filter(c => c.endsWith("key") || c.endsWith("_id"))
      val amplified = df
        .withColumn("__copy", explode(sequence(lit(0L), lit(factor - 1L))))
        .repartition(spark.sparkContext.defaultParallelism)
      keyCols.foldLeft(amplified) { (d, c) =>
          d.withColumn(c, (col(c) + col("__copy") * shift).cast(df.schema(c).dataType))
        }
        .drop("__copy")
        .write.mode("overwrite").parquet(out.toString)
      // marker written AFTER the data: a crash mid-write leaves no
      // marker, so the next run rebuilds rather than trusting a torn dir
      java.nio.file.Files.write(marker, (want + "\n").getBytes("UTF-8"))
      ()
    }
  }

  /** [[amplify1000]] for RECALL fixtures: key-shifted copies with the
    * embedding column PERTURBED per copy, so top-k ground truth is
    * non-degenerate. Byte-identical amplification makes every query's
    * top-k its own copies inside its first-probed cell — any recall
    * number on it is reassuring noise (the r13 fourth decade declined
    * to measure one for exactly this reason). Here each copy adds
    * deterministic per-element uniform noise in ±`sigma`
    * (`xxhash64(vec_id, copy, i)` — reproducible, no RNG state), giving
    * noise norm ≈ sigma·√(64/3) ≈ 4.6·sigma. At the default 0.1 that is
    * ‖n‖ ≈ 0.46 on unit vectors: copy↔base cosine ≈ 0.91, far above
    * the ≤ 0.60 nearest-DISTINCT-base cosine of this corpus, so a
    * query's true neighbors stay same-base copies — but WHICH copies,
    * and which cells they quantize into, is decided by noise geometry
    * the index must actually chase across cell boundaries. */
  def amplifyJitter(spark: SparkSession, srcDir: String, outDir: String,
                    factor: Int, sigma: Double = 0.1): Unit = {
    val shift = 100000000L
    val table = "embeddings"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val out = java.nio.file.Paths.get(outDir, s"$table.parquet")
    val marker = java.nio.file.Paths.get(outDir, s"$table.parquet.marker")
    val srcFp = graft.core.FsUtil.snapshotFingerprint(
      java.nio.file.Paths.get(srcDir, s"$table.parquet"))
    val want = s"factor=$factor;sigma=$sigma;jitter=1;src=$srcFp"
    val upToDate = java.nio.file.Files.exists(out) &&
      java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim == want
    if (!upToDate) {
      val df = spark.read.parquet(s"$srcDir/$table.parquet")
      // uniform in [-1, 1): hash → 20 bits → scale. All copies are
      // jittered (including copy 0), so NO byte-identical pair survives
      // anywhere in the fixture.
      def noise(i: Column): Column =
        (pmod(xxhash64(col("vec_id"), col("__copy"), i), lit(1L << 20))
          .cast("double") / lit((1L << 19).toDouble)) - lit(1.0)
      df.withColumn("__copy", explode(sequence(lit(0L), lit(factor - 1L))))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x.cast("double") + lit(sigma) * noise(i)).cast("float")))
        .withColumn("vec_id", col("vec_id") + col("__copy") * shift)
        .drop("__copy")
        .write.mode("overwrite").parquet(out.toString)
      java.nio.file.Files.write(marker, (want + "\n").getBytes("UTF-8"))
      ()
    }
  }

  /** One-time, marker-guarded IVF+PQ layout fixture for `dir`'s
    * embeddings (build/serve split: a production index is built once and
    * probed many times; only SERVE is ever a timed row). Marker carries
    * the corpus snapshot fingerprint + params, so regenerated embeddings
    * rebuild. Same params as the q_ann_ivfpq_layout bench row. */
  def annLayoutFixture(spark: SparkSession, dir: String,
                       nCells: Int = 64, lloydIters: Int = 4): String = {
    import graft.ops.{Layout, Similarity}
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val suffix = if (nCells == 64) "" else s"_c$nCells"
    val fixDir = s"${sys.props("java.io.tmpdir")}/graft_1000x_ivfpq_$tag$suffix"
    val layoutDir = s"$fixDir/layout"
    val marker = java.nio.file.Paths.get(s"$fixDir/_BUILT")
    val buildTag = OpsQueries.embSnapshotKey(dir) +
      s"|ivf(nCells=$nCells,lloyd=$lloydIters,dims=64)|pq(m=16,kSub=16)|rawv1|adc2"
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == buildTag
    if (!fresh) {
      graft.core.FsUtil.deleteRecursive(java.nio.file.Paths.get(fixDir))
      val emb = Tables(spark, dir, "embeddings")
      val t0 = System.nanoTime()
      // default cells: the same memoized trainings the bench rows use;
      // scaled cells (production sizing, nCells grows with the corpus):
      // train here — assignment passes cost O(rows * nCells), so the
      // scaled fixture uses fewer Lloyd iterations (the row measures
      // SERVE cost vs probed fraction, not quantizer convergence)
      val cents =
        if (nCells == 64 && lloydIters == 4) OpsQueries.ivfCentsFor(spark, dir)
        else Similarity.ivfIndex(emb, nCells = nCells, lloydIters = lloydIters)._2
      val books = OpsQueries.pqBooksFor(spark, dir)
      Layout.pqWrite(Similarity.assignCells(emb, cents), cents, books, layoutDir)
      println(f"[scale] ann layout build ($dir, nCells=$nCells, lloyd=$lloydIters): ${(System.nanoTime() - t0) / 1e9}%.1fs (untimed fixture)")
      java.nio.file.Files.write(marker, buildTag.getBytes("UTF-8"))
    }
    layoutDir
  }

  /** The timed ANN serve: ADC top-k off the persisted layout, partition-
    * pruned to probed cells ([[graft.ops.Layout.ivfPqTopKFromLayout]]).
    * `nCells` selects the fixture; nProbe stays 32 (the bench config),
    * so probed fraction = 32/nCells — the production knob the scaled-
    * cells row measures. */
  def annServe(spark: SparkSession, dir: String, nCells: Int = 64,
               lloydIters: Int = 4): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    graft.ops.Layout.ivfPqTopKFromLayout(spark,
      annLayoutFixture(spark, dir, nCells, lloydIters), emb,
      emb.where(col("vec_id") < 10), k = 5)
  }

  /** Marker-guarded IMI layout fixture (two-level pruned layout,
    * [[graft.ops.Layout.imiWrite]]): k per half pinned at 16
    * → 256 pair cells at the third decade, the same cell count as the
    * scaled IVF fixture, so imi_serve vs ann_serve_cells256 is a direct
    * quantizer A/B at equal probed fraction. */
  def imiLayoutFixture(spark: SparkSession, dir: String, k: Int = 16,
                       lloydIters: Int = 4): String = {
    import graft.ops.{Layout, Similarity}
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val fixDir = s"${sys.props("java.io.tmpdir")}/graft_1000x_imi_${tag}_k$k"
    val layoutDir = s"$fixDir/layout"
    val marker = java.nio.file.Paths.get(s"$fixDir/_BUILT")
    val buildTag = OpsQueries.embSnapshotKey(dir) +
      s"|imi(k=$k,lloyd=$lloydIters,dims=64)|pairv2"
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == buildTag
    if (!fresh) {
      graft.core.FsUtil.deleteRecursive(java.nio.file.Paths.get(fixDir))
      val emb = Tables(spark, dir, "embeddings")
      val t0 = System.nanoTime()
      val (indexed, cents) = Similarity.imiIndex(emb, k = k, lloydIters = lloydIters)
      Layout.imiWrite(indexed, cents, layoutDir)
      println(f"[scale] imi layout build ($dir, k=$k, lloyd=$lloydIters): ${(System.nanoTime() - t0) / 1e9}%.1fs (untimed fixture)")
      java.nio.file.Files.write(marker, buildTag.getBytes("UTF-8"))
    }
    layoutDir
  }

  /** The timed IMI serve off the persisted two-level layout: nProbe=32
    * pair cells of the 256 → same 12.5%% probed fraction as the scaled
    * IVF row. */
  def imiServe(spark: SparkSession, dir: String, k: Int = 16,
               lloydIters: Int = 4): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    graft.ops.Layout.imiTopKFromLayout(spark,
      imiLayoutFixture(spark, dir, k, lloydIters),
      emb.where(col("vec_id") < 10), k = 5, nProbe = 32)
  }

  /** Marker-guarded IMI+PQ layout fixture: the composed production
    * config — same 2×16 half codebooks as [[imiLayoutFixture]], codes
    * packed with the bench PQ books (m=16, kSub=16). */
  def imiPqLayoutFixture(spark: SparkSession, dir: String, k: Int = 16,
                         lloydIters: Int = 4,
                         fusedDirCap: Int = 4096): String = {
    import graft.ops.{Layout, Similarity}
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val capTag = if (fusedDirCap == 4096) "" else s"_cap$fusedDirCap"
    val fixDir =
      s"${sys.props("java.io.tmpdir")}/graft_1000x_imipq_${tag}_k$k$capTag"
    val layoutDir = s"$fixDir/layout"
    val marker = java.nio.file.Paths.get(s"$fixDir/_BUILT")
    val buildTag = OpsQueries.embSnapshotKey(dir) +
      s"|imi(k=$k,lloyd=$lloydIters,dims=64)|pq(m=16,kSub=16)|pairv2$capTag|rawv1|adc2"
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == buildTag
    if (!fresh) {
      graft.core.FsUtil.deleteRecursive(java.nio.file.Paths.get(fixDir))
      val emb = Tables(spark, dir, "embeddings")
      val t0 = System.nanoTime()
      val (indexed, cents) = Similarity.imiIndex(emb, k = k, lloydIters = lloydIters)
      Layout.imiPqWrite(indexed, cents, OpsQueries.pqBooksFor(spark, dir),
        layoutDir, fusedDirCap = fusedDirCap)
      println(f"[scale] imipq layout build ($dir, k=$k, lloyd=$lloydIters, cap=$fusedDirCap): ${(System.nanoTime() - t0) / 1e9}%.1fs (untimed fixture)")
      java.nio.file.Files.write(marker, buildTag.getBytes("UTF-8"))
    }
    layoutDir
  }

  /** The timed IMI+PQ serve: ADC off the two-level pruned packed
    * codes, same probed fraction as [[imiServe]]. */
  def imiPqServe(spark: SparkSession, dir: String, k: Int = 16,
                 lloydIters: Int = 4, fusedDirCap: Int = 4096): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    graft.ops.Layout.imiPqTopKFromLayout(spark,
      imiPqLayoutFixture(spark, dir, k, lloydIters, fusedDirCap), emb,
      emb.where(col("vec_id") < 10), k = 5, nProbe = 32)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // At 1000× the bench default (shuffle partitions = cores) puts ~30M
    // window-hash rows in one task — beyond a local executor's execution
    // memory. Sizing partitions to the data is the same knob a real
    // cluster turns (brief: "size shuffle.partitions so partitions fit");
    // 256 keeps per-task state ~4M rows. Overridable for A/Bs.
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args.toSet) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf01 = "/root/testdata/sf0.1"
    val amp = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED1000_DIR",
      "/tmp/graft_sf100_documents")
    val only0: Set[String] = only.getOrElse(Set.empty)
    val tAmp0 = System.nanoTime()
    amplify1000(spark, sf01, amp, factor = 1000)
    // embeddings only amplify when an ANN row will run (2M vectors):
    // every serve row (ann_serve_*, imi_serve_*, imipq_serve_*) and the
    // IMI training rows read the amplified embeddings table
    if (only.isEmpty || only0.exists(n => n.contains("serve") || n.startsWith("imi")))
      amplify1000(spark, sf01, amp, factor = 1000, table = "embeddings")
    println(f"[1000x] amplify: ${(System.nanoTime() - tAmp0) / 1e9}%.1fs")

    def docs(dir: String) = Tables(spark, dir, "documents")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body catch { case e: Throwable =>
        System.err.println(s"[1000x] FAILED: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the three registered headliners run verbatim through SparkEntry —
    // the same code path the bench and the correctness gate measure
    def reg(name: String)(dir: String): DataFrame =
      SparkEntry.queries(name)(spark, dir)
    def ppComposed(dir: String): DataFrame = {
      val sample = docs(dir).where(col("doc_id") % R8Queries.PpJoinMod === 0)
      Dedup.ppJoin(Dedup.collapseExact(sample, "doc_id", "text", None),
        threshold = R8Queries.PpJoinThreshold)
    }
    def bpeHybrid(dir: String): Unit =
      { Bpe.train(docs(dir), nMerges = R8Queries.BpeMerges); () }

    val rows = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    // The dup-span family's measured env protocol (SCALING.md r14: a
    // 64 GB heap is a 2–3× PESSIMIZATION — the 1B-row localCheckpoint
    // churns storage memory where a small heap spills once and the OS
    // page cache serves re-reads) is ENFORCED here, not just documented:
    // under an oversized heap the family's rows are SKIPPED loudly, so a
    // 2× slow number can never silently merge into SCALING_1000.json.
    // Deliberate A/Bs opt out with SPARK_GRAFT_ALLOW_BIGHEAP_DUPSPAN=1.
    // r15 note: the fused window-count defaults REMOVED the family's
    // localCheckpoint and with it the pathology's mechanism (fused spans
    // measured 162 s at 64g/256 vs the old form's 597.6) — the guard
    // stays because the artifact's recorded rows are protocol-pinned at
    // 16g/64, and env-mixed rows would break cross-round comparability.
    val dupSpanFamily = Set("q_dup_spans", "q_dup_span_strip")
    val heapGb = Runtime.getRuntime.maxMemory.toDouble / (1L << 30)
    // r19: bracketed mode — the manual adjudication loop (calibrate,
    // run, calibrate, refuse out-of-band reads) that caught the r18
    // 68.12 s slow-window read, mechanized so a bad read can never
    // reach SCALING_1000.json by forgetting the revert. When
    // SPARK_GRAFT_ROW_ANCHOR is set, each row is bracketed by a
    // q_dedup_embed min-of-2 noop probe (BenchRows' sentinel) at sf0.1;
    // a row whose brackets exceed anchor x band is REFUSED (not merged)
    // UNLESS it still tightens the prior registry value — a slow-window
    // read that beats the reference bounds the quiet truth from above
    // (the r18 strip-row argument), so the tightening-only rule admits
    // it. SPARK_GRAFT_WAIT_QUIET_SEC (default 0) polls the probe before
    // each row until it enters the band or the budget expires (the row
    // then runs anyway; the bracket still adjudicates the merge). Note
    // the family env (shuffle=64 vs the bench's 32) can read the probe
    // a few ms different from the BenchRows anchor — supply the anchor
    // consciously, don't copy it blindly across envs.
    val rowAnchor = sys.env.get("SPARK_GRAFT_ROW_ANCHOR").map(_.toDouble)
    val rowBand = sys.env.getOrElse("SPARK_GRAFT_ROW_BAND", "1.25").toDouble
    val waitQuietSec = sys.env.getOrElse("SPARK_GRAFT_WAIT_QUIET_SEC", "0").toInt
    // Max hypervisor-steal fraction (steal/(busy+steal) from /proc/stat,
    // integrated over the timed body) for a read to count as in-band.
    // The r19 sweep that forced this: point probes bracketing a 30 s row
    // sampled lulls between steal bursts and certified eight 1.3-2.0x
    // loosenings in a window hostwatch measured at mean stolen_frac 0.30
    // (1/(1-0.30) = 1.43x — matching the loosenings). Brackets see the
    // edges; only in-row integration sees the interior.
    val maxSteal = sys.env.getOrElse("SPARK_GRAFT_MAX_STEAL", "0.05").toDouble
    val refused = scala.collection.mutable.ArrayBuffer[String]()
    var sentinelWarm = false
    def probe(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        noop(reg("q_dedup_embed")(sf01))
        (System.nanoTime() - t0) / 1e9
      }
      // Warm to STABILITY, not a fixed discard count: the r19 gate run
      // showed the sentinel pipeline keeps C2-compiling for ~30
      // executions (polls declined 0.62 -> 0.40 on an OS-idle host), so
      // a single discarded run makes early polls report JIT warmth as
      // contention and burn the quiet budget. Run until the best-of-3
      // rolling min stops improving >3% (cap 24 runs, ~10 s) — the
      // steady-state sentinel BenchRows' fully-warmed JVM reaches.
      if (!sentinelWarm) {
        var best = once()
        var sinceImproved = 0
        var n = 1
        while (sinceImproved < 3 && n < 24) {
          val r = once(); n += 1
          if (r < best * 0.97) { best = r; sinceImproved = 0 }
          else sinceImproved += 1
        }
        println(f"[1000x] sentinel warmed: $n%d runs, steady $best%.3fs")
        sentinelWarm = true
      }
      math.min(once(), once())
    }
    // Memory-bandwidth floor for the third-channel gate (r19): starts
    // at the env anchor if supplied, else self-calibrates as the min
    // reading seen this session — it only ever tightens, so an
    // all-contended session is lenient early (the consistency rule
    // backstops that) and sharp as soon as one quiet reading lands.
    var memFloor = sys.env.get("SPARK_GRAFT_MEM_ANCHOR").map(_.toDouble)
      .getOrElse(Double.MaxValue)
    def memRead(): Double = {
      val m = HostSteal.memProbe()
      if (m < memFloor) {
        if (memFloor != Double.MaxValue)
          println(f"[1000x] membw floor tightened: $memFloor%.4f -> $m%.4f s")
        memFloor = m
      }
      m
    }
    def run(name: String, warm: => Unit)(body: => Unit): Unit = {
      // exists, not forall: naming several rows must run each of them
      if (only.nonEmpty && !only.exists(_.contains(name))) return
      if (dupSpanFamily(name) && heapGb > 24 &&
          !sys.env.contains("SPARK_GRAFT_ALLOW_BIGHEAP_DUPSPAN")) {
        println(f"[1000x] SKIP $name: heap $heapGb%.0fg exceeds the family's " +
          "measured 16g/64 protocol (2-3x pessimization, SCALING.md r14); " +
          "rerun with SPARK_DRIVER_MEM=16g SPARK_GRAFT_SHUFFLE=64, or set " +
          "SPARK_GRAFT_ALLOW_BIGHEAP_DUPSPAN=1 for a deliberate A/B")
        return
      }
      if (dupSpanFamily(name) && shuffleParts != "64")
        println(s"[1000x] WARN $name: shuffle partitions $shuffleParts differ " +
          "from the family's measured protocol (64)")
      time(warm) // sf0.1 warmup: JIT + codegen for this pipeline
      rowAnchor match {
        case None =>
          val s = time(body)
          println(f"[1000x] $name%s: $s%.2fs")
          rows += ((name, s))
        case Some(anchor) =>
          // SPARK_GRAFT_ROW_ATTEMPTS (default 1): a refused read may
          // re-enter the quiet-wait loop and try again in the SAME warm
          // JVM. The r19 hostwatch traces show this host's steal
          // whipsaw has a period of minutes — shorter than a cold gate
          // launch (sbt + Spark init + warmup ≈ 2-4 min), so a
          // one-shot run keeps missing windows it could have caught
          // had it stayed resident and polled. The first accepted read
          // (in-band, or out-of-band-but-tightening) ends the hunt;
          // each attempt's verdict logs independently.
          val attempts = sys.env.getOrElse("SPARK_GRAFT_ROW_ATTEMPTS", "1").toInt
          val cut = anchor * rowBand
          var accepted = false
          var attempt = 0
          while (!accepted && attempt < attempts) {
            attempt += 1
            var b0 = probe()
            var m0 = memRead()
            def memOk(m: Double) = m <= memFloor * rowBand
            val deadline = System.nanoTime() + waitQuietSec * 1000000000L
            while ((b0 > cut || !memOk(m0)) && System.nanoTime() < deadline) {
              println(f"[1000x] $name: waiting for quiet (probe $b0%.3f > $cut%.3f " +
                f"or membw $m0%.4f > ${memFloor * rowBand}%.4f)")
              Thread.sleep(20000)
              b0 = probe(); m0 = memRead()
            }
            val ticks0 = HostSteal.ticks()
            val s = time(body)
            val ticks1 = HostSteal.ticks()
            // Closing bracket: best-of-3 with 5 s settles. Probing the
            // instant a 50-130 s full-tilt job ends conflates the job's
            // own residue (full old-gen, cold sentinel code paths evicted
            // by the big pipeline) with ambient contention; the logged
            // trace tells them apart — residue recovers across the three
            // reads, a hot neighbor doesn't. min() is still honest: a
            // genuinely contended window keeps all three reads high.
            val trace = (0 until 3).map { i =>
              if (i > 0) Thread.sleep(5000)
              probe()
            }
            val b1 = trace.min
            val m1 = memRead()
            println(f"[1000x] $name: closing trace " +
              trace.map(v => f"$v%.3f").mkString("[", ",", "]") +
              f" membw=[$m0%.4f,$m1%.4f] floor=$memFloor%.4f")
            val steal = HostSteal.stolenFrac(ticks0, ticks1)
            steal.foreach(f => println(f"[1000x] $name: in-row stolen_frac $f%.3f" +
              (if (f > maxSteal) f" > $maxSteal%.2f — read disqualified from in-band" else "")))
            // Registry-consistency rule (r19, the 88.26 s lesson): an
            // "in-band" read may loosen the registry by at most the
            // band factor itself. The registered values are adjudicated
            // honest-or-conservative, so a bracket-clean low-steal read
            // at 1.6x the registry is self-contradictory — it means a
            // contention channel BOTH instruments are blind to (the
            // night's attempt 1: 239 s at 13% CPU steal = ~3.8x
            // steal-adjusted; memory-bandwidth/LLC pressure from a
            // co-tenant inflates a shuffle-heavy row without accruing
            // steal ticks or slowing a sub-second probe much). Such a
            // read must not overwrite the registry as if certified.
            val prior = priorSeconds(name)
            val consistent = prior.forall(p => s <= p * rowBand)
            if (!consistent && b0 <= cut && b1 <= cut &&
                steal.forall(_ <= maxSteal) && memOk(m0) && memOk(m1))
              println(f"[1000x] $name: read $s%.2fs is ${s / prior.get}%.2fx the " +
                f"registry ${prior.get}%.2fs with clean brackets AND low steal — " +
                "an unmeasured contention channel; certificate rejected")
            val inBand = b0 <= cut && b1 <= cut && steal.forall(_ <= maxSteal) &&
              memOk(m0) && memOk(m1) && consistent
            println(f"[1000x] $name%s: $s%.2fs  brackets=[$b0%.3f,$b1%.3f] " +
              f"anchor=$anchor%.3f band=$rowBand%.2f in_band=$inBand " +
              f"attempt=$attempt/$attempts")
            if (inBand || s >= 0 && priorSeconds(name).forall(s < _)) {
              if (!inBand) println(f"[1000x] $name: out-of-band read $s%.2fs still " +
                "tightens the registry — merged under the bounds-from-above rule")
              rows += ((name, s))
              accepted = true
            } else if (attempt < attempts) {
              println(f"[1000x] $name: attempt $attempt refused — re-entering " +
                "the quiet-wait loop in the warm JVM")
            } else {
              refused += name
              println(f"[1000x] $name: REFUSED (brackets out of band, no tighten) " +
                "— registry value kept")
            }
          }
      }
    }
    // prior registry value for one row, for the bounds-from-above rule
    def priorSeconds(name: String): Option[Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("SCALING_1000.json")), "UTF-8")
        ("\"" + name + "@1000x\":(-?[0-9.]+)").r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
      } catch { case _: Throwable => None }

    run("q_dedup_corpus", noop(reg("q_dedup_corpus")(sf01)))(
      noop(reg("q_dedup_corpus")(amp)))
    run("q_corpus_curate", noop(reg("q_corpus_curate")(sf01)))(
      noop(reg("q_corpus_curate")(amp)))
    run("ppjoin_composed", noop(ppComposed(sf01)))(noop(ppComposed(amp)))
    run("bpe_train_hybrid", bpeHybrid(sf01))(bpeHybrid(amp))
    run("q_dup_spans", noop(reg("q_dup_spans")(sf01)))(
      noop(reg("q_dup_spans")(amp)))
    // round-11 rows: the strip STAGE (not just span finding), BPE
    // application (train + nested-replace apply, the q_bpe_tokens
    // pipeline verbatim), and the layout-serve path whose
    // partition-pruning claim the third decade is meant to test
    run("q_dup_span_strip", noop(reg("q_dup_span_strip")(sf01)))(
      noop(reg("q_dup_span_strip")(amp)))
    run("q_bpe_tokens", noop(reg("q_bpe_tokens")(sf01)))(
      noop(reg("q_bpe_tokens")(amp)))
    // fixture builds happen in the WARM thunk (never inside the timed
    // serve — a cold environment would otherwise time build+serve)
    run("ann_serve_layout", {
      annLayoutFixture(spark, sf01); annLayoutFixture(spark, amp)
      noop(annServe(spark, sf01))
    })(noop(annServe(spark, amp)))
    // production cell sizing at the third decade: 4x the cells at the
    // same nProbe=32 — probed fraction falls 50% -> 12.5%; this is the
    // DEPLOY.md knob (nCells grows with the corpus) measured rather
    // than asserted. lloyd=1 for the scaled fixture: assignment passes
    // cost O(rows * nCells) and the row measures serve, not convergence.
    run("ann_serve_cells256", {
      annLayoutFixture(spark, amp, nCells = 256, lloydIters = 1)
      noop(annServe(spark, sf01))
    })(noop(annServe(spark, amp, nCells = 256, lloydIters = 1)))
    // round 12: the sizing rule is now CODE (Similarity.autoCells, the
    // ivfIndex default) — this row serves off the fixture autoCells
    // picks for THIS corpus (2M vectors → 245 cells), so the encoded
    // default is measured at the third decade, not just the hand-chosen
    // 256-cell A/B above. lloyd=1 like the other scaled fixture.
    lazy val autoN = graft.ops.Similarity.autoCells(
      Tables(spark, amp, "embeddings").count())
    run("ann_serve_cellsauto", {
      annLayoutFixture(spark, amp, nCells = autoN, lloydIters = 1)
      noop(annServe(spark, sf01))
    })(noop(annServe(spark, amp, nCells = autoN, lloydIters = 1)))
    // r12: the IMI fused-training claim measured at 2M vectors — one
    // corpus pass per Lloyd step vs the sequential two-half form it
    // replaced (spec pins them bit-identical; this row pins the COST).
    // k = 16 per half (pinned: rows compare against the r12-recorded
    // sequential baseline), lloyd = 4. Training cost only:
    // both forms end before the lazy full-corpus assignment.
    import graft.ops.Similarity
    def imiFused(dir: String): Unit =
      { Similarity.imiIndex(Tables(spark, dir, "embeddings"), k = 16, lloydIters = 4); () }
    def imiSeq(dir: String): Unit = {
      val emb = Tables(spark, dir, "embeddings")
      for (lo <- Seq(1, 33))
        Similarity.ivfIndex(
          emb.select(col("vec_id"), slice(col("embedding"), lo, 32).as("__h")),
          nCells = 16, lloydIters = 4, dims = 32, vecCol = "__h")
    }
    run("imi_train_fused", imiFused(sf01))(imiFused(amp))
    run("imi_train_seq", imiSeq(sf01))(imiSeq(amp))
    // r12: IMI SERVE at the third decade — 2x16 half codebooks = 256
    // pair cells, nProbe=32 → the same 12.5% probed fraction as
    // ann_serve_cells256, directly A/B-ing the two-level pruned layout
    // against the flat scaled-cells IVF+PQ layout
    run("imi_serve_layout", {
      imiLayoutFixture(spark, sf01); imiLayoutFixture(spark, amp)
      noop(imiServe(spark, sf01))
    })(noop(imiServe(spark, amp)))
    // r12: the composed IMI+PQ serve at the same probed fraction — the
    // production config (two-level cells over 8-byte ADC code words);
    // vs imi_serve_layout it isolates what PQ compression buys the
    // two-level layout's scan
    run("imipq_serve_layout", {
      imiPqLayoutFixture(spark, sf01); imiPqLayoutFixture(spark, amp)
      noop(imiPqServe(spark, sf01))
    })(noop(imiPqServe(spark, amp)))
    // r13: the BELOW-the-cap half of the fusedDirCap bracket. The
    // mid/deep _rg A/Bs measured the row-group regime winning ABOVE
    // 256 pairs (1.3×@1024, 1.5–1.9×@4096); the 256 default rests on
    // the further claim that AT ≤256 pairs the regimes tie (the 10-
    // query × nProbe=32 probe set saturates the pair space, so both
    // degenerate to a near-full scan and directory count stops
    // mattering). Measure it: same k=16/256-pair fixture with
    // fusedDirCap forced below the pair space. If rg won here too the
    // cap should be 0; if fused won decisively it should rise.
    run("imipq_serve_layout_rg", {
      imiPqLayoutFixture(spark, amp, fusedDirCap = 128)
      noop(imiPqServe(spark, sf01))
    })(noop(imiPqServe(spark, amp, fusedDirCap = 128)))
    // r12: the maintenance claim measured — appending a 1% increment
    // (20k vectors) into the 2M-vector IMI+PQ layout must cost O(new
    // data), nowhere near the ~90 s full build. The append target is a
    // throwaway COPY of the fixture (the marker-guarded fixture itself
    // must never be mutated or every serve row after it drifts).
    // r12: the DEEP-CELL regime the IMI exists for — k=64 per half →
    // 4096 pair cells at 2M vectors (~500 rows/cell), 10 queries ×
    // nProbe=32 probe ≤ 320 pairs = 7.8% of the pair space, so the
    // two-level pruning actually ENGAGES (at k=16 the probe set nearly
    // saturates the 256-pair space and every serve row degenerates to a
    // near-full scan — measured above). lloyd=1: the row measures
    // serve vs pair-space size, not quantizer convergence.
    run("imipq_serve_deep", {
      imiPqLayoutFixture(spark, amp, k = 64, lloydIters = 1)
      noop(imiPqServe(spark, sf01))
    })(noop(imiPqServe(spark, amp, k = 64, lloydIters = 1)))
    // r13: the ROW-GROUP-PRUNING regime at the same 4096-pair space —
    // fusedDirCap forced below the pair count, so the layout partitions
    // by cell1 (64 dirs) with pair-sorted files and the exact fused-pair
    // IN set prunes at parquet row-group min/max stats instead of the
    // directory listing. This is the read path every k ≥ 4096 production
    // config uses (16.8M pair directories would be a filesystem problem);
    // the A/B against imipq_serve_deep prices row-group pruning vs
    // directory pruning at an identical probe set and pair space.
    run("imipq_serve_deep_rg", {
      imiPqLayoutFixture(spark, amp, k = 64, lloydIters = 1, fusedDirCap = 256)
      noop(imiPqServe(spark, sf01))
    })(noop(imiPqServe(spark, amp, k = 64, lloydIters = 1, fusedDirCap = 256)))
    // middle point of the pair-space curve (k=32 → 1024 pairs, ~2k
    // rows/cell): locates the knee between the saturated 256-pair
    // config and the 4096-pair deep row, and backs the autoCellsImi
    // target-rows default with a measured curve instead of one point
    run("imipq_serve_mid", {
      imiPqLayoutFixture(spark, amp, k = 32, lloydIters = 1)
      noop(imiPqServe(spark, sf01))
    })(noop(imiPqServe(spark, amp, k = 32, lloydIters = 1)))
    // r13: the mid point in the ROW-GROUP regime — with deep_rg this
    // brackets the fusedDirCap default: fused directories pay a
    // listing + per-file footer cost that grows with the pair count
    // while the rg regime's cost is flat in it, so the crossover
    // (where fused dirs stop paying for themselves) sits between the
    // last pair-space where fused wins and the first where rg does.
    run("imipq_serve_mid_rg", {
      imiPqLayoutFixture(spark, amp, k = 32, lloydIters = 1, fusedDirCap = 256)
      noop(imiPqServe(spark, sf01))
    })(noop(imiPqServe(spark, amp, k = 32, lloydIters = 1, fusedDirCap = 256)))
    // r12: the postings-layout BM25 serve at the third decade — the
    // "serving touches |query-term buckets|/nBuckets of the index"
    // claim with 1000x the postings behind it. Build untimed (marker-
    // guarded); serve = 3 terms → ≤3 of 64 bucket dirs.
    def bm25Fixture(dir: String): String = {
      import graft.ops.Layout
      val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val fixDir = s"${sys.props("java.io.tmpdir")}/graft_1000x_bm25_$tag"
      val marker = java.nio.file.Paths.get(s"$fixDir/_BUILT")
      val fp = graft.core.FsUtil.snapshotFingerprint(
        java.nio.file.Paths.get(s"$dir/documents.parquet"))
      val buildTag = s"$dir|$fp|buckets=64|dl-in-postings"
      val fresh = java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == buildTag
      if (!fresh) {
        graft.core.FsUtil.deleteRecursive(java.nio.file.Paths.get(fixDir))
        val t0 = System.nanoTime()
        Layout.postingsWrite(docs(dir), s"$fixDir/layout")
        println(f"[scale] bm25 postings build ($dir): ${(System.nanoTime() - t0) / 1e9}%.1fs (untimed fixture)")
        java.nio.file.Files.write(marker, buildTag.getBytes("UTF-8"))
      }
      s"$fixDir/layout"
    }
    val bmQuery = Seq("spark", "query", "merge")
    run("bm25_serve_layout", {
      bm25Fixture(sf01); bm25Fixture(amp)
      noop(graft.ops.Layout.bm25FromLayout(spark, bm25Fixture(sf01), bmQuery))
    })(noop(graft.ops.Layout.bm25FromLayout(spark, bm25Fixture(amp), bmQuery)))
    // r13: the SELECTIVE-term serve — the r12 verdict's one unmeasured
    // structural claim. 'dup' is the corpus's rare token (~0.03% of
    // postings vs ~3% for each common term), so the tok-sorted bucket
    // files' row-group stats can actually engage: the 3-common-term row
    // above reads ~every row group of its 3 buckets by construction
    // (SCALING.md r12 admitted this), while this row's read should be
    // bounded by the term's postings, not its bucket's. The row-group
    // skip itself is spec-gated (LayoutSpec sorted-vs-unsorted A/B);
    // this row records the 1000x serve cost, and the scanned-rows
    // evidence prints untimed after the timed run.
    run("bm25_serve_rare", {
      bm25Fixture(sf01); bm25Fixture(amp)
      noop(graft.ops.Layout.bm25FromLayout(spark, bm25Fixture(sf01), Seq("dup")))
    })(noop(graft.ops.Layout.bm25FromLayout(spark, bm25Fixture(amp), Seq("dup"))))
    // evidence prints whenever the timed row itself ran (advisor r13:
    // `forall` skipped it when other rows were named alongside)
    if (only.isEmpty || only.exists(_.contains("bm25_serve_rare"))) {
      val served = graft.ops.Layout.bm25FromLayout(spark, bm25Fixture(amp), Seq("dup"))
      // collect() (the LayoutSpec pattern), NOT noop: df.write runs a
      // SEPARATE QueryExecution, so metrics read off served's own
      // executedPlan would be untouched zeros — the r13 first cut of
      // this print did exactly that and reported max-scan=0, which
      // looked like perfect pruning and was actually an unexecuted plan
      val servedRows = served.collect().length
      val scanned = org.apache.spark.sql.graftbridge.Bridge
        .scannedOutputRows(served).filter(_ > 0)
      val totalPostings = spark.read
        .parquet(s"${bm25Fixture(amp)}/postings").count()
      println(f"[1000x] bm25_serve_rare scan evidence: max-scan=${
        if (scanned.isEmpty) 0L else scanned.max} rows of $totalPostings postings, served=$servedRows docs")
      // relevance evidence at the third decade (r15 verdict task 6,
      // untimed): the pruned layout's top-20 must equal the unpruned
      // ad-hoc scorer's top-20 — for the rare term AND the common
      // 3-term query — at 5M docs, where row-group and bucket pruning
      // both actually engage. Distributed top-k (orderBy+limit), never
      // a full collect.
      for (q <- Seq(Seq("dup"), bmQuery)) {
        def topk(df: DataFrame) = df
          .orderBy(col("score").desc, col("doc_id")).limit(20)
          .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
        val lay = topk(graft.ops.Layout.bm25FromLayout(spark, bm25Fixture(amp), q))
        val adhoc = topk(graft.ops.TextAnalysis.bm25(docs(amp), q))
        require(lay == adhoc && lay.nonEmpty,
          s"[1000x] bm25 layout top-20 diverged from unpruned for $q:\n  $lay\n  $adhoc")
        println(s"[1000x] bm25 top-20 equality held for query $q (untimed evidence)")
      }
    }
    val appendTestDir = s"${sys.props("java.io.tmpdir")}/graft_1000x_imipq_appendtest"
    run("imipq_append_1pct", {
      val src = java.nio.file.Paths.get(imiPqLayoutFixture(spark, amp))
      val dst = java.nio.file.Paths.get(appendTestDir)
      graft.core.FsUtil.deleteRecursive(dst)
      // HARDLINK tree, not a byte copy (r13): append only ADDS files —
      // existing layout files are never modified — so links are safe,
      // and the warm thunk stops writing ~0.5 GB whose writeback the
      // timed append then paid (the rawv layouts made the old byte copy
      // 5× bigger and the row jumped 2.0 → 3.7 s from copy writeback
      // alone; links restore a clean append measurement)
      scala.util.Using.resource(java.nio.file.Files.walk(src)) { walk =>
        walk.forEach { p =>
          val t = dst.resolve(src.relativize(p))
          if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
          else java.nio.file.Files.createLink(t, p): Unit
        }
      }
      // the increment MATERIALIZES untimed (1% = the first 10 of the
      // 1000 key-shifted copies): production increments arrive as their
      // own small table — selecting 20k rows out of the 2M-row corpus
      // is not append cost
      Tables(spark, amp, "embeddings")
        .where(col("vec_id") / lit(100000000L) < 10)
        .write.mode("overwrite").parquet(s"$appendTestDir.increment")
    })(graft.ops.Layout.imiPqAppend(
      spark.read.parquet(s"$appendTestDir.increment"), appendTestDir))

    // Locale.ROOT: a comma-decimal default locale (de_DE) would emit
    // 364,038 — invalid JSON
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // merge-on-write: a filtered rerun (args) patches its rows into the
    // existing artifact instead of discarding the unfiltered ones.
    // The parse is anchored to keys ending in @1000x so a future numeric
    // top-level field (e.g. a total) can't be folded into the queries map.
    val prior: Map[String, String] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("SCALING_1000.json")), "UTF-8")
        "\"([A-Za-z0-9_]+@1000x)\":(-?[0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2)).toMap
      } catch { case _: Throwable => Map.empty }
    // a FAILED row (-1) never overwrites a previously measured value
    val merged = prior ++ rows.collect {
      case (n, s) if s >= 0 => (n + "@1000x") -> fmt(s)
    }
    val json = merged.toSeq.sortBy(_._1)
      .map { case (n, v) => "\"" + n + "\":" + v }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"scaling_1000x","unit":"sec","queries":$json}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("SCALING_1000.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}

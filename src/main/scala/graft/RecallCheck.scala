package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: ANN recall vs brute force per sf (bounds for the
  * q_ann_* accuracy-contract oracles). Sweeps a small parameter grid so
  * contract bounds are chosen from measurements, not hope. */
object RecallCheck {
  /** Deep-cell regime grid (r14, closes the r13 autoProbesImi scope
    * caveat): k = 64 per half → 4096 pair cells over the JITTERED 2M
    * fixture (~488 rows/cell — the production shape where probed
    * fractions are tiny), recall@5 vs brute force across probe counts.
    * The jittered fixture makes ground truth non-degenerate (see
    * [[ThirdDecade.amplifyJitter]]); the key-shifted one would report
    * reassuring noise. Raw-IMI and IMI+PQ arms, sample-trained books
    * (production practice at this scale). Run: `runMain graft.RecallCheck deep`
    *
    * `RecallCheck band` runs the same sweep at k = 9 and 12 (pair spaces
    * 81/144) — the band between the shallow fraction grid's k ≤ 8 edge
    * and the deep grid's k ≥ 16 floor, measured r15 so the absolute-probe
    * rule's regime boundary is a measurement, not an extrapolation. */
  private def deepGrid(spark: SparkSession,
                       ks: Seq[Int] = Seq(16, 32, 64, 99),
                       gates: Boolean = true): Unit = {
    import graft.ops.Similarity
    val src = "/root/testdata/sf0.1"
    val jit = sys.env.getOrElse("SPARK_GRAFT_JIT1000_DIR", "/tmp/graft_sf1000_embjit")
    ThirdDecade.amplifyJitter(spark, src, jit, factor = 1000)
    val emb = Tables(spark, jit, "embeddings")
    val queries = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("query_id").as("eq"), col("neighbor_id").as("en"))
    exact.cache(); val nExact = exact.count()
    def recall(ann: org.apache.spark.sql.DataFrame): Double = {
      val hits = ann.select("query_id", "neighbor_id")
        .join(exact, col("query_id") === col("eq") && col("neighbor_id") === col("en"), "left_semi")
        .count()
      hits.toDouble / nExact
    }
    val books = Similarity.pqTrain(emb.where(pmod(col("vec_id"), lit(97L)) === 3L))
    // k sweep across the mid + deep regimes (the shallow fraction grid
    // was measured at k = 4–8 on the unjittered corpora): what matters
    // here is whether the probe COUNT that saturates recall is absolute
    // or fraction-scaled as the pair space grows. k = 99 is the 20M
    // anchor's autoCellsImi config measured at THIS decade (~204
    // rows/cell) — the cross-decade link point.
    for (k <- ks) {
      val (indexed, cents) = Similarity.imiIndex(emb, k = k, lloydIters = 1)
      indexed.cache(); indexed.count()
      val pairSpace = k * k
      for (nProbe <- Seq(8, 16, 32, 64, 128).filter(_ <= pairSpace)) {
        val rImi = recall(Similarity.imiTopK(indexed, cents, queries, k = 5, nProbe = nProbe))
        val rPq = recall(Similarity.imiPqTopK(indexed, cents, books, queries, k = 5, nProbe = nProbe))
        println(f"RECALL deep-jit2M imi k=$k probe=$nProbe (${nProbe * 100.0 / pairSpace}%.2f%%) imi=$rImi%.3f imipq=$rPq%.3f")
      }
      // the PQ arm's plateau is SHORTLIST-bound on this fixture (top-k
      // margins thinner than ADC quantization error): sweep it
      for (shortlist <- Seq(100, 400, 1600, 6400)) {
        val rPq = recall(Similarity.imiPqTopK(indexed, cents, books, queries,
          k = 5, nProbe = 32, shortlist = shortlist))
        println(f"RECALL deep-jit2M imipq k=$k probe=32 shortlist=$shortlist r=$rPq%.3f")
      }
      // standing gate: the deep-regime sizing rules must keep deriving
      // configs that MEET their target on this grid's own fixture — in
      // the regime the rules are FOR (autoCellsImi-sized cells, ≥ ~488
      // rows/cell here). k = 99 at 2M is a deliberate 10×-OVER-SHARDED
      // boundary point (~204 rows/cell): clusters fragment across more
      // cells and the 0.9-target absolute count doubles (measured 32 →
      // 0.88, 64 → 0.94) — gate it at the doubled count instead, so the
      // boundary stays measured without pretending the rule covers it.
      if (gates) {
        val sized = 2000000L / (k.toLong * k) >= 400
        val nAuto0 = Similarity.autoProbesImi(k, 0.9)
        require(nAuto0 == 32,
          s"deep autoProbesImi(k=$k, 0.9) drifted from the measured 32: $nAuto0")
        val nAuto = if (sized) nAuto0 else nAuto0 * 2
        val rAuto = recall(Similarity.imiTopK(indexed, cents, queries, k = 5, nProbe = nAuto))
        require(rAuto >= 0.9 - 1e-9,
          s"deep auto-probed IMI config fell below its 0.9 target at k=$k (sized=$sized, nProbe=$nAuto): $rAuto")
        // C = 1000: amplifyJitter(factor = 1000) makes 1000-copy clusters
        val sAuto = Similarity.autoShortlistImiPq(0.9, expectedClusterSize = 1000L)
        val rS = recall(Similarity.imiPqTopK(indexed, cents, books, queries,
          k = 5, nProbe = nAuto, shortlist = sAuto))
        // over-sharded boundary: the PQ arm inherits the same fragmentation;
        // gate it at its measured floor there
        val pqFloor = if (sized) 0.9 else 0.8
        require(rS >= pqFloor - 1e-9,
          s"deep auto-shortlisted IMI+PQ config fell below its $pqFloor floor at k=$k: $rS")
        println(f"RECALL deep-jit2M auto k=$k probes=$nAuto shortlist=$sAuto sized=$sized imi=$rAuto%.3f imipq=$rS%.3f (gates held)")
      }
      indexed.unpersist()
    }
    exact.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    if (args.contains("deep")) { deepGrid(spark); spark.stop(); return }
    if (args.contains("band")) {
      // the k = 9–15 band between the two regimes, measured r15
      // (k = 9/12: probes 8 → 0.86, 16 → 0.98, 32 → 1.00 min across the
      // band) — the absolute rule is conservative here, and the standing
      // gates now apply like any other deep-grid k
      deepGrid(spark, ks = Seq(9, 12))
      spark.stop(); return
    }
    if (args.contains("10000x")) {
      // standing pin for the 20M jittered recall anchor (r14): the
      // fourth decade's serve numbers must keep a live recall anchor.
      // Floors sit just under the measured r14 values (SCALING_10000
      // rows); a config/fixture drift that craters recall fails loud.
      // The PQ floor is on the cluster-size-scaled shortlist — see
      // recallAnchor's sweep — and monotonicity of the sweep itself.
      val r = FourthDecade.recallAnchor(spark)
      require(r("imi_recall_jit") >= 0.9,
        s"20M jittered IMI recall fell below its 0.9 floor: $r")
      val sweep = Seq(100, 400, 1600, 6400).map(s => r(s"imipq_recall_jit_sl$s"))
      require(sweep.zip(sweep.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"PQ shortlist sweep must be monotone: $sweep")
      // at the cluster-size-scaled shortlist the PQ arm must rejoin the
      // probe-bound (raw-IMI) ceiling — measured 0.94 == 0.94 in r14.
      // r16 (verdict task 3): C is no longer hand-passed from fixture
      // knowledge — recallAnchor ESTIMATES it with clusterSizeStat over
      // the copy-identity key, and this gate certifies the whole
      // production loop (estimate → auto-size → serve) at 20M. The
      // estimate itself is sanity-pinned to the fixture's known 10000.
      val cEst = r("cluster_size_est").toLong
      require(cEst == 10000L,
        s"clusterSizeStat on the jittered 20M fixture must recover C=10000, got $cEst")
      val slAuto = Similarity.autoShortlistImiPq(0.9, expectedClusterSize = cEst)
      require(r.contains(s"imipq_recall_jit_sl$slAuto"),
        s"recallAnchor sweep must include the auto-derived shortlist $slAuto: ${r.keys}")
      require(r(s"imipq_recall_jit_sl$slAuto") >= 0.9 &&
          r(s"imipq_recall_jit_sl$slAuto") >= r("imi_recall_jit") - 0.05,
        s"PQ at auto-derived sl=$slAuto must rejoin the probe-bound ceiling: $r")
      spark.stop(); return
    }
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = Tables(spark, s"/root/testdata/$sf", "embeddings")
      val queries = emb.where(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select(col("query_id").as("eq"), col("neighbor_id").as("en"))
      exact.cache(); val nExact = exact.count()
      def recall(ann: org.apache.spark.sql.DataFrame): Double = {
        val hits = ann.select("query_id", "neighbor_id")
          .join(exact, col("query_id") === col("eq") && col("neighbor_id") === col("en"), "left_semi")
          .count()
        hits.toDouble / nExact
      }
      for ((bits, tables) <- Seq((6, 16))) { // shipped default
        val r = recall(Similarity.annTopK(emb, queries, k = 5, nBits = bits, nTables = tables))
        println(s"RECALL $sf lsh bits=$bits tables=$tables r=$r")
      }
      // shipped default + the cheaper-train candidate: 2 Lloyd iters
      // measured 0.90/0.92/0.88 vs 4 iters' 0.90/0.92/0.92 across
      // sf0.001/0.01/0.1 (2026-08-13) — unlike PQ (where 2 ≡ 4), the
      // sf0.1 recall drops a real 4 points, so ivfIndex KEEPS
      // lloydIters=4; revisit only if training time ever dominates.
      for ((cells, iters, probe) <- Seq((64, 4, 32), (64, 2, 32))) {
        val (indexed, cents) = Similarity.ivfIndex(emb, nCells = cells, lloydIters = iters)
        indexed.cache()
        val r = recall(Similarity.ivfTopK(indexed, cents, queries, k = 5, nProbe = probe))
        println(s"RECALL $sf ivf cells=$cells iters=$iters probe=$probe r=$r")
        indexed.unpersist()
      }
      // IMI grid (r12): pair-cell recall at varying codebook size /
      // probed fraction — picks the registered q_ann_imi config
      for ((k2, iters, probe) <- Seq((4, 2, 8), (4, 2, 12), (4, 4, 8),
          (8, 2, 16), (8, 2, 32), (8, 4, 32))) {
        val (indexed, cents) = Similarity.imiIndex(emb, k = k2, lloydIters = iters)
        indexed.cache()
        val r = recall(Similarity.imiTopK(indexed, cents, queries, k = 5, nProbe = probe))
        println(s"RECALL $sf imi k=$k2 iters=$iters probe=$probe (${probe * 100 / (k2 * k2)}%) r=$r")
        indexed.unpersist()
      }
      // the AUTO config (r12: autoCellsImi's measured 2k-rows/cell
      // knee): what imiIndex(corpus) picks with no explicit k — pins
      // the recall consequence of the deeper default at each scale
      locally {
        val kAuto = Similarity.autoCellsImi(emb.count())
        val (indexed, cents) = Similarity.imiIndex(emb, k = kAuto, lloydIters = 2)
        indexed.cache()
        val r = recall(Similarity.imiTopK(indexed, cents, queries, k = 5, nProbe = 32))
        println(s"RECALL $sf imi-auto k=$kAuto iters=2 probe=32 (${32 * 100 / (kAuto * kAuto)}%) r=$r")
        indexed.unpersist()
      }
      // r13: the GRID-DERIVED probe config — autoProbesImi(k, 0.9)
      // must reproduce the registered 12-of-16 and meet its own target
      // at every scale (the function encodes this grid; this block
      // keeps it honest against future grid drift)
      locally {
        val kReg = 4
        val nProbe = Similarity.autoProbesImi(kReg, targetRecall = 0.9)
        require(nProbe == 12,
          s"autoProbesImi($kReg, 0.9) drifted from the registered 12: $nProbe")
        val (indexed, cents) = Similarity.imiIndex(emb, k = kReg, lloydIters = 2)
        indexed.cache()
        val r = recall(Similarity.imiTopK(indexed, cents, queries, k = 5, nProbe = nProbe))
        println(s"RECALL $sf imi-autoprobe k=$kReg probe=$nProbe (${nProbe * 100 / (kReg * kReg)}%) r=$r")
        require(r >= 0.9 - 1e-9,
          s"auto-probed IMI config fell below its 0.9 target at $sf: $r")
        indexed.unpersist()
      }
      // IMI+PQ composition (r12): the registered q_ann_imipq_layout
      // config — ADC quantization error on top of the pair-cell probe
      // loss, recovered by the exact shortlist re-rank
      for ((k2, iters, probe) <- Seq((4, 2, 12), (4, 2, 16))) {
        val (indexed, cents) = Similarity.imiIndex(emb, k = k2, lloydIters = iters)
        indexed.cache()
        val books = OpsQueries.pqBooksFor(spark, s"/root/testdata/$sf")
        val r = recall(Similarity.imiPqTopK(indexed, cents, books, queries,
          k = 5, nProbe = probe))
        println(s"RECALL $sf imipq k=$k2 iters=$iters probe=$probe (${probe * 100 / (k2 * k2)}%) r=$r")
        indexed.unpersist()
      }
      exact.unpersist()
    }
    spark.stop()
  }
}

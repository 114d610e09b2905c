package graft.ops

import graft.functions.ZOrderKey
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators for scan pruning at 100 TB: write files whose
 * min/max column ranges are NARROW (z-order clustering), keep those
 * ranges in a small stats index (one row per file), and plan reads
 * against the index so predicate ranges touch only intersecting files —
 * the file-skipping core of every lakehouse table format, expressed over
 * plain parquet directories.
 *
 * Scale shape: the index is O(files), kilobytes per petabyte-scale
 * table; pruning is a driver-side interval check followed by a scan of
 * only the selected files. With a z-ordered layout BOTH clustered
 * dimensions prune (see `ZOrderSpec`'s tile-span property); a
 * single-column sort prunes only itself.
 */
object Layout {

  /** Write `df` clustered by the Morton key of (xCol, yCol) into
    * `nFiles` range partitions — every output file covers a compact
    * rectangle of the (x, y) domain. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
                  dir: String, nFiles: Int): Unit =
    df.withColumn("__graft_zkey", ZOrderKey(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__graft_zkey"))
      .sortWithinPartitions("__graft_zkey")
      .drop("__graft_zkey")
      .write.mode("overwrite").parquet(dir)

  /** Write an IVF-indexed corpus (from [[Similarity.ivfIndex]]) as a
    * `cell`-partitioned parquet layout plus a `_centroids.tsv` sidecar,
    * so probes become Catalyst partition pruning: a query that filters
    * `cell IN (probe cells)` lists and reads only those cell
    * directories — nProbe/nCells of the files, no index lookup at query
    * time. Rows are hash-repartitioned on `cell` first so each cell
    * lands in one file (no small-file fan-out from the input
    * partitioning). */
  def ivfWrite(indexed: DataFrame, centroids: Array[(Int, Array[Double])],
               dir: String): Unit = {
    indexed
      .repartition(centroids.length, col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val spark = indexed.sparkSession
    val p = new org.apache.hadoop.fs.Path(dir, "_centroids.tsv")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try centroids.foreach { case (cid, v) =>
      out.write(s"$cid\t${v.mkString(",")}\n".getBytes("UTF-8"))
    } finally out.close()
  }

  /**
   * Persist the full compressed index (IVF + PQ): 8-byte packed code
   * words partitioned by coarse cell, plus the centroid and codebook
   * sidecars. At 100 TB this is THE serving layout: a 256 B float32
   * row shrinks to one `(vec_id, packed long)` scan row in exactly the
   * cell directory a probe prunes to, so a query's ADC stage reads
   * nProbe/nCells of 8-byte words.
   *
   * The full-precision vector is stored ALONGSIDE the code word in the
   * same files (r13). Parquet is columnar, so the ADC scan still reads
   * only (id, packed) — the serve plan's ReadSchema never includes the
   * vector (spec-gated) — but the shortlist re-rank can now fetch raw
   * vectors from the SAME cell-pruned read instead of joining against
   * the corpus table, which was a hidden O(corpus) scan on the serve
   * path: invisible at 2M rows, dominant at 20M+ (every other serve
   * input is O(probed cells)). Storage-wise the vectors live in the
   * index instead of beside it — total bytes unchanged when the index
   * is the only consumer of raw vectors, and at 100 TB a serve path
   * that rescans the corpus table per query cannot exist.
   *
   * Expects `indexed` from [[Similarity.ivfIndex]] (has `cell`) and
   * `books` from [[Similarity.pqTrain]] on the same corpus.
   */
  def pqWrite(indexed: DataFrame, centroids: Array[(Int, Array[Double])],
              books: Similarity.PqBooks, dir: String, dims: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val m = books.length
    Similarity.pqEncode(indexed, books, dims, idCol, vecCol)
      .select(col(idCol), col("cell"),
        Similarity.pqPack(col("codes"), m).as("packed"), col(vecCol))
      .repartition(centroids.length, col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    val spark = indexed.sparkSession
    writeTsv(spark, s"$dir/_centroids.tsv",
      centroids.iterator.map { case (cid, v) => s"$cid\t${v.mkString(",")}" })
    writeTsv(spark, s"$dir/_codebooks.tsv",
      for { s <- books.indices.iterator; (cid, c) <- books(s).iterator }
        yield s"$s\t$cid\t${c.mkString(",")}")
  }

  /**
   * Persist an [[Similarity.imiIndex]]'d corpus as a TWO-LEVEL pruned
   * layout. Every row carries the FUSED pair key `pair = cell1·k₂ +
   * cell2` (a physical int column), and the partitioning adapts to the
   * pair-space size (r13, erasing the small-pair-space regime caveat):
   *
   *  - pair-space ≤ `fusedDirCap`: `partitionBy(pair)` — probed pairs
   *    become EXACT partition pruning (one directory per probed pair,
   *    never the Cartesian cell1×cell2 superset).
   *  - larger: `partitionBy(cell1)` — bounded at k directories — with
   *    rows sorted by (cell1, cell2) ≡ by `pair` inside each
   *    partition's files, so a probe prunes twice: cell1 at the
   *    listing, and the probed `pair` set at the parquet row-group
   *    min/max stats (`pair IN (...)` is EXACT, unlike the old
   *    cell2-IN superset). Materializing the k² pairs as directories
   *    up there would be a filesystem problem (16.8M dirs at
   *    k = 4096); k dirs × exact pair row-group pruning gives the same
   *    read bound without the listing blowup.
   *
   * The default cap is 256 — MEASURED, not a style choice (r13 sweep,
   * same window per pair): at a 1024-pair space the row-group regime
   * served 1.3× faster than fused directories (4.41 vs 5.77 s @2M),
   * at 4096 pairs 1.5–1.9× (3.53 vs 5.36 s). Fused directories pay a
   * per-directory listing + per-file parquet-footer cost that grows
   * with the pair count, and under the [[Similarity.autoCellsImi]]
   * sizing rule (~2k rows/cell) each pair directory holds ~2k rows —
   * tiny files at ANY corpus size — while the row-group regime keeps
   * k₁ directories of large pair-sorted files whose row groups prune
   * on the same exact fused-pair set. Below ~256 pairs a realistic
   * probe set saturates the pair space anyway, so the regimes tie and
   * fused keeps the simpler all-directory pruning story.
   *
   * Serve/append/compact DETECT the regime from the directory names, so
   * one code path covers both. Sidecars carry both half codebooks.
   */
  def imiWrite(indexed: DataFrame,
               cents: (Array[(Int, Array[Double])], Array[(Int, Array[Double])]),
               dir: String, fusedDirCap: Int = 256): Unit = {
    writeImiPartitioned(withPairKey(indexed, cents._2.length), cents,
      s"$dir/data", fusedDirCap, mode = "overwrite")
    val spark = indexed.sparkSession
    writeTsv(spark, s"$dir/_centroids1.tsv",
      cents._1.iterator.map { case (cid, v) => s"$cid\t${v.mkString(",")}" })
    writeTsv(spark, s"$dir/_centroids2.tsv",
      cents._2.iterator.map { case (cid, v) => s"$cid\t${v.mkString(",")}" })
  }

  /** The fused pair key: `cell1·k₂ + cell2`, one int per row. Int range
    * is safe by construction (k ≤ 4096 per half ⇒ pair < 2²⁴). */
  private def withPairKey(df: DataFrame, k2: Int): DataFrame =
    df.withColumn("pair", (col("cell1") * k2 + col("cell2")).cast("int"))

  /** Shared writer for both IMI regimes (see [[imiWrite]]): fused-pair
    * directories when the pair space is bounded, cell1 directories with
    * pair-sorted files otherwise. */
  private def writeImiPartitioned(withPair: DataFrame,
                                  cents: (Array[(Int, Array[Double])], Array[(Int, Array[Double])]),
                                  path: String, fusedDirCap: Int,
                                  mode: String): Unit = {
    val pairSpace = cents._1.length.toLong * cents._2.length
    if (pairSpace <= fusedDirCap)
      withPair
        // task count capped at the parallelism: hash-partitioning on
        // `pair` already lands each pair wholly in one task (≤ one file
        // per pair dir either way), and pairSpace tasks for a small
        // append is pure commit overhead (measured: the 20k-row append
        // arm spent ~1 s on 256 task commits)
        .repartition(math.min(pairSpace,
          withPair.sparkSession.sparkContext.defaultParallelism.toLong).toInt,
          col("pair"))
        .write.mode(mode).partitionBy("pair").parquet(path)
    else
      withPair
        .repartition(cents._1.length, col("cell1"))
        // (cell1, cell2) sort ≡ pair sort within a cell1 partition:
        // tight pair min/max row-group stats
        .sortWithinPartitions("cell1", "cell2")
        .write.mode(mode).partitionBy("cell1").parquet(path)
  }

  /** Which partition column an IMI layout's data/codes dir was written
    * with — `pair` (fused regime) or `cell1`. Detected from the
    * directory names so serve/append/compact never need to be told. */
  private def imiPartCol(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.listStatus(p).exists(s => s.isDirectory &&
        s.getPath.getName.startsWith("pair="))) "pair" else "cell1"
  }

  private lazy val logger = org.slf4j.LoggerFactory.getLogger("graft.ops.Layout")

  /** One-line deprecation signal when a serve falls back to a pre-r13
    * layout regime. Results stay exact either way; the legacy read
    * bounds (full-corpus re-rank, Cartesian-superset pruning) do not
    * scale — see DEPLOY.md "Legacy layouts" for the rewrite path. */
  private def legacyWarn(dir: String, what: String, fix: String): Unit =
    logger.warn(s"DEPRECATED legacy layout served from $dir: $what. " +
      s"Rewrite path: $fix (DEPLOY.md 'Legacy layouts').")

  /** Exact pair-probe predicate for an IMI layout scan: partition
    * pruning on the layout's partition column plus the EXACT fused-pair
    * set pushed to row-group stats. Falls back to the r12 Cartesian
    * superset predicate only for legacy layouts that predate the `pair`
    * column (results were always exact either way — the (cell1, cell2)
    * probe join filters the superset; only the read bound differed). */
  private def prunePairs(all: DataFrame, partCol: String, k2: Int,
                         pairs: Array[(Int, Int)], dir: String): DataFrame = {
    if (pairs.isEmpty) return all.where(lit(false))
    val fusedPairs = pairs.map { case (a, b) => a * k2 + b }.toIndexedSeq
    if (partCol == "pair")
      all.where(col("pair").isin(fusedPairs: _*))
    else if (all.columns.contains("pair"))
      all.where(col("cell1").isin(pairs.map(_._1).distinct.toIndexedSeq: _*) &&
        col("pair").isin(fusedPairs: _*))
    else {
      legacyWarn(dir, "no fused `pair` column — pruning by the Cartesian " +
        "(cell1 IN, cell2 IN) superset, a loose read bound",
        "rebuild with imiWrite/imiPqWrite (appends mirror the legacy schema, they do not upgrade it)")
      all.where(col("cell1").isin(pairs.map(_._1).distinct.toIndexedSeq: _*) &&
        col("cell2").isin(pairs.map(_._2).distinct.toIndexedSeq: _*))
    }
  }

  /**
   * Persist the full two-level compressed index (IMI + PQ): 8-byte
   * packed code words partitioned by `cell1` (bounded at k directories)
   * and SORTED by `cell2` within each partition's files, plus both half
   * codebooks and the PQ codebooks as sidecars. The production serving
   * layout past the single-level cell cap: pair probes prune twice
   * (cell1 at the listing, cell2 at the row-group stats) AND every
   * scanned row is a packed code word instead of a raw vector — the
   * [[pqWrite]] compression and the [[imiWrite]] cell-count path
   * composed. Raw vectors stay in the corpus table for the shortlist
   * re-rank only.
   *
   * Expects `indexed` from [[Similarity.imiIndex]] (has `cell1`/`cell2`)
   * and `books` from [[Similarity.pqTrain]] on the same corpus.
   */
  def imiPqWrite(indexed: DataFrame,
                 cents: (Array[(Int, Array[Double])], Array[(Int, Array[Double])]),
                 books: Similarity.PqBooks, dir: String, dims: Int = 64,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 fusedDirCap: Int = 256): Unit = {
    val m = books.length
    writeImiPartitioned(
      withPairKey(Similarity.pqEncode(indexed, books, dims, idCol, vecCol)
        .select(col(idCol), col("cell1"), col("cell2"),
          Similarity.pqPack(col("codes"), m).as("packed"), col(vecCol)),
        cents._2.length),
      cents, s"$dir/codes", fusedDirCap, mode = "overwrite")
    val spark = indexed.sparkSession
    writeTsv(spark, s"$dir/_centroids1.tsv",
      cents._1.iterator.map { case (cid, v) => s"$cid\t${v.mkString(",")}" })
    writeTsv(spark, s"$dir/_centroids2.tsv",
      cents._2.iterator.map { case (cid, v) => s"$cid\t${v.mkString(",")}" })
    writeTsv(spark, s"$dir/_codebooks.tsv",
      for { s <- books.indices.iterator; (cid, c) <- books(s).iterator }
        yield s"$s\t$cid\t${c.mkString(",")}")
  }

  /**
   * ADC top-k served straight off an [[imiPqWrite]] layout — identical
   * results to the in-memory [[Similarity.imiPqTopK]] (same pair
   * probes, same lookup table, same shortlist re-rank; `LayoutSpec`
   * pins parity), but the scan is a two-level pruned read of packed
   * codes: probed cell1 values list only their partition directories,
   * probed cell2 values push into the cell2-sorted files' row-group
   * stats, and each scanned row is 8 bytes. `corpus` supplies the raw
   * vectors for the shortlist re-rank only.
   */
  def imiPqTopKFromLayout(spark: SparkSession, dir: String, corpus: DataFrame,
                          queries: DataFrame, k: Int, nProbe: Int = 32,
                          shortlist: Int = 100, dims: Int = 64,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = readImiCentroids(spark, dir)
    val books = readPqBooks(spark, dir)
    val m = books.length
    val half = dims / 2
    val qRows = Similarity.collectQueries(queries, idCol, vecCol)
    val (qIds, lutM) = Similarity.pqLutMatrix(qRows, books, dims / m)
    val probes = queries.select(col(idCol).as("query_id"),
        explode(Similarity.imiProbesCol(cents, nProbe, col(vecCol), half)).as("__p"))
      .select(col("query_id"),
        col("__p.cell1").as("cell1"), col("__p.cell2").as("cell2"))
    val pairs = probes.select("cell1", "cell2").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val all = spark.read.parquet(s"$dir/codes")
    val pruned = prunePairs(all, imiPartCol(spark, s"$dir/codes"),
      cents._2.length, pairs, s"$dir/codes")
    // fused ADC over the packed words (r13) — see [[graft.functions.PqAdcDist]]
    val approx = pruned
      .join(broadcast(probes), Seq("cell1", "cell2"))
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        graft.functions.PqAdcDist(col("packed"), col("query_id"),
          qIds, lutM, m).as("adist"))
    // Re-rank from the same pair-pruned read when the layout stores raw
    // vectors (r13; see [[pqWrite]]) — the corpus arg is the legacy
    // fallback whose full-corpus join this change removed.
    val rerankSrc =
      if (all.columns.contains(vecCol)) pruned.select(col(idCol), col(vecCol))
      else {
        legacyWarn(s"$dir/codes", s"no `$vecCol` column — shortlist re-rank " +
          "joins the full corpus argument, an O(corpus) serve input",
          "rebuild with imiPqWrite (appends mirror the legacy schema, they do not upgrade it)")
        corpus
      }
    Similarity.adcShortlistRerank(approx, rerankSrc, queries, k, shortlist, idCol, vecCol)
  }

  /** Incremental maintenance for an [[ivfWrite]] layout: assign ONLY
    * `newVectors` under the frozen sidecar centroids and append into
    * the cell partition directories. O(new data); see [[pqAppend]] for
    * the maintenance contract. */
  def ivfAppend(newVectors: DataFrame, dir: String,
                vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val centroids = readIvfCentroids(spark, dir)
    Similarity.assignCells(newVectors, centroids, vecCol)
      .repartition(centroids.length, col("cell"))
      .write.mode("append").partitionBy("cell").parquet(dir)
  }

  /** Incremental maintenance for an [[imiWrite]] layout: pair-cell
    * assignment under the frozen sidecar codebooks, appended in the
    * layout's OWN regime (fused pair dirs or cell1 dirs + pair-sorted
    * files — detected, never guessed, so an append can't split the
    * layout across regimes). */
  def imiAppend(newVectors: DataFrame, dir: String, dims: Int = 64,
                vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val cents = readImiCentroids(spark, dir)
    appendImiPartitioned(
      Similarity.assignImiCells(newVectors, cents, dims, vecCol),
      cents, s"$dir/data")
  }

  /** Append `assigned` (has cell1/cell2) into an existing IMI layout
    * dir, mirroring its partition regime AND its schema (a legacy
    * pre-`pair` layout keeps its schema — mixed per-file schemas would
    * make the column vanish under the default non-merging read). */
  private def appendImiPartitioned(assigned: DataFrame,
                                   cents: (Array[(Int, Array[Double])], Array[(Int, Array[Double])]),
                                   path: String,
                                   layoutCols: Option[Seq[String]] = None): Unit = {
    val spark = assigned.sparkSession
    val partCol = imiPartCol(spark, path)
    // layoutCols: pre-read schema columns, so one append costs ONE
    // directory listing/schema read, not one per flag (each
    // spark.read.parquet is a leaf-file listing job — measurable per
    // micro-batch under streaming ingest)
    val hasPair = partCol == "pair" ||
      layoutCols.getOrElse(spark.read.parquet(path).columns.toSeq).contains("pair")
    val df = if (hasPair) withPairKey(assigned, cents._2.length) else assigned
    if (partCol == "pair")
      df.repartition(math.min(cents._1.length.toLong * cents._2.length,
          df.sparkSession.sparkContext.defaultParallelism.toLong).toInt,
          col("pair"))
        .write.mode("append").partitionBy("pair").parquet(path)
    else
      df.repartition(cents._1.length, col("cell1"))
        .sortWithinPartitions("cell1", "cell2")
        .write.mode("append").partitionBy("cell1").parquet(path)
  }

  /**
   * Incremental index maintenance for a [[pqWrite]] layout: encode ONLY
   * `newVectors` under the layout's FROZEN quantizer + codebooks (read
   * from the sidecars, never retrained — so the appended codes are
   * byte-identical to what a full rebuild with the same quantizer would
   * produce; `LayoutSpec` pins append ≡ rebuild) and append them into
   * the cell partition directories. O(new data): the indexed corpus is
   * never rescanned, the shuffle is one repartition of the increment.
   * Each append lands ≤ one file per touched cell; consolidate small
   * files off the hot path like any partitioned layout. Quantizer
   * drift (a corpus that moved off the trained centroids) is a REBUILD
   * decision, not an append concern — appends always use the sidecar
   * codebooks, so a mismatched caller parameter cannot split the index.
   */
  def pqAppend(newVectors: DataFrame, dir: String, dims: Int = 64,
               idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val centroids = readIvfCentroids(spark, dir)
    val books = readPqBooks(spark, dir)
    val m = books.length
    // mirror the layout's own schema: a legacy pre-vector layout must
    // not gain a mixed per-file schema (the column would vanish under
    // the default non-merging read)
    val hasVec = spark.read.parquet(s"$dir/codes").columns.contains(vecCol)
    val encoded = Similarity.pqEncode(
        Similarity.assignCells(newVectors, centroids, vecCol), books, dims, idCol, vecCol)
    val rows =
      if (hasVec) encoded.select(col(idCol), col("cell"),
        Similarity.pqPack(col("codes"), m).as("packed"), col(vecCol))
      else encoded.select(col(idCol), col("cell"),
        Similarity.pqPack(col("codes"), m).as("packed"))
    rows
      .repartition(centroids.length, col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
  }

  /** [[pqAppend]] for an [[imiPqWrite]] layout: new vectors are
    * pair-cell-assigned and PQ-encoded under the frozen sidecar
    * codebooks, then appended in the layout's own partition regime
    * (see [[appendImiPartitioned]]). */
  def imiPqAppend(newVectors: DataFrame, dir: String, dims: Int = 64,
                  idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val cents = readImiCentroids(spark, dir)
    val books = readPqBooks(spark, dir)
    val m = books.length
    // ONE schema read serves both the vector-column and pair-column
    // mirroring decisions (legacy layouts keep their schema)
    val layoutCols = spark.read.parquet(s"$dir/codes").columns.toSeq
    val hasVec = layoutCols.contains(vecCol)
    val encoded = Similarity.pqEncode(
        Similarity.assignImiCells(newVectors, cents, dims, vecCol), books, dims, idCol, vecCol)
    val base = Seq(col(idCol), col("cell1"), col("cell2"),
      Similarity.pqPack(col("codes"), m).as("packed"))
    appendImiPartitioned(
      encoded.select((if (hasVec) base :+ col(vecCol) else base): _*),
      cents, s"$dir/codes", Some(layoutCols))
  }

  /** Both codebook sidecars of an [[imiWrite]] layout. */
  def readImiCentroids(spark: SparkSession, dir: String)
      : (Array[(Int, Array[Double])], Array[(Int, Array[Double])]) = {
    def read(path: String) = readTsvLines(spark, path).map { line =>
      val Array(cid, vec) = line.split("\t", 2)
      (cid.toInt, vec.split(",").map(_.toDouble))
    }
    (read(s"$dir/_centroids1.tsv"), read(s"$dir/_centroids2.tsv"))
  }

  /**
   * IMI search straight off an [[imiWrite]] layout — identical results
   * to the in-memory [[Similarity.imiTopK]] (spec-pinned): the probed
   * pair set is bounded (nQueries × nProbe, collected to literals) and
   * pruned EXACTLY via [[prunePairs]] — fused-pair partition pruning in
   * the fused regime, or cell1 partition pruning plus the fused-pair IN
   * set at the pair-sorted row-group stats in the big-pair-space
   * regime — two pruning levels, no query-time index structure.
   */
  def imiTopKFromLayout(spark: SparkSession, dir: String, queries: DataFrame,
                        k: Int, nProbe: Int = 32, dims: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = readImiCentroids(spark, dir)
    val half = dims / 2
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      explode(Similarity.imiProbesCol(cents, nProbe, col(vecCol), half)).as("__p"))
      .select(col("query_id"), col("qvec"),
        col("__p.cell1").as("cell1"), col("__p.cell2").as("cell2"))
    val pairs = q.select("cell1", "cell2").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val all = spark.read.parquet(s"$dir/data")
    val pruned = prunePairs(all, imiPartCol(spark, s"$dir/data"),
      cents._2.length, pairs, s"$dir/data")
    val c = pruned.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      col("cell1"), col("cell2"))
    Similarity.ivfScore(c, q, k, keys = Seq("cell1", "cell2"))
  }

  /** Codebook sidecar of a [[pqWrite]] layout. */
  def readPqBooks(spark: SparkSession, dir: String): Similarity.PqBooks = {
    val rows = readTsvLines(spark, s"$dir/_codebooks.tsv").map { line =>
      val Array(s, cid, vec) = line.split("\t", 3)
      (s.toInt, cid.toInt, vec.split(",").map(_.toDouble))
    }
    rows.groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(r => (r._2, r._3)))
  }

  /**
   * ADC top-k served straight off a [[pqWrite]] layout — identical
   * results to the in-memory [[Similarity.ivfPqTopK]] (same probe
   * cells, same lookup table, same shortlist re-rank; `LayoutSpec`
   * pins parity), but the scan is a partition-pruned read of packed
   * codes: `cell IN (probes)` lists only the probed directories and
   * each scanned row is 8 bytes. `corpus` supplies the raw vectors for
   * the shortlist re-rank only.
   */
  def ivfPqTopKFromLayout(spark: SparkSession, dir: String, corpus: DataFrame,
                          queries: DataFrame, k: Int, nProbe: Int = 32,
                          shortlist: Int = 100, dims: Int = 64,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroids = readIvfCentroids(spark, dir)
    val books = readPqBooks(spark, dir)
    val m = books.length
    val qRows = Similarity.collectQueries(queries, idCol, vecCol)
    val (qIds, lutM) = Similarity.pqLutMatrix(qRows, books, dims / m)
    val probes = Similarity.probeCells(spark, centroids, qRows, nProbe)
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val all = spark.read.parquet(s"$dir/codes")
    val pruned = all
      .where(col("cell").isin(cells: _*)) // partition filter: probed dirs only
    // fused ADC over the packed words (r13): one row per (query,
    // candidate), no 16× unpack-explode, no aggregate exchange — see
    // [[graft.functions.PqAdcDist]]
    val approx = pruned
      .join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        graft.functions.PqAdcDist(col("packed"), col("query_id"),
          qIds, lutM, m).as("adist"))
    // Shortlist re-rank vectors come from the SAME cell-pruned read when
    // the layout stores them (r13) — O(probed cells), and columnar
    // pruning keeps the ADC scan above 8-bytes-per-row narrow. The corpus arg
    // is the fallback for legacy pre-vector layouts only (a full-corpus
    // re-rank join — the scan this change removed from the serve path).
    val rerankSrc =
      if (all.columns.contains(vecCol)) pruned.select(col(idCol), col(vecCol))
      else {
        legacyWarn(s"$dir/codes", s"no `$vecCol` column — shortlist re-rank " +
          "joins the full corpus argument, an O(corpus) serve input",
          "rebuild with pqWrite (appends mirror the legacy schema, they do not upgrade it)")
        corpus
      }
    Similarity.adcShortlistRerank(approx, rerankSrc, queries, k, shortlist, idCol, vecCol)
  }

  private def writeTsv(spark: SparkSession, path: String,
                       lines: Iterator[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try lines.foreach(l => out.write((l + "\n").getBytes("UTF-8")))
    finally out.close()
  }

  private def readTsvLines(spark: SparkSession, path: String): Array[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).toArray
    finally in.close()
  }

  /** Centroid sidecar of an [[ivfWrite]] layout. */
  def readIvfCentroids(spark: SparkSession, dir: String): Array[(Int, Array[Double])] = {
    val p = new org.apache.hadoop.fs.Path(dir, "_centroids.tsv")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).map { line =>
      val Array(cid, vec) = line.split("\t", 2)
      (cid.toInt, vec.split(",").map(_.toDouble))
    }.toArray
    finally in.close()
  }

  /**
   * Inverted-index layout for BM25 serving: postings `(tok, doc_id,
   * tf)` partitioned by a TERM-HASH BUCKET, a per-doc length table, and
   * a one-row exact corpus-stats table (`n_docs`, `sum_dl` as longs, so
   * `avgdl` is recomputed with the same exact division the ad-hoc
   * scorer uses). A query's terms map to buckets → Catalyst partition
   * pruning lists and reads only those bucket directories: serving a
   * 3-term query against a petabyte corpus touches 3/nBuckets of the
   * postings, no re-tokenization, no query-time index structure.
   */
  def postingsWrite(docs: DataFrame, dir: String, nBuckets: Int = 64,
                    idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dl = docs.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("dl"))
    // dl DENORMALIZED into every posting (a BUILD-time join — the same
    // tokenCount expression the ad-hoc scorer uses, so score parity is
    // by construction): +8 B per row buys serving that never touches a
    // corpus-sized doclen table — the dominant serve cost for common
    // terms (see [[bm25FromLayout]])
    tf.join(dl, Seq(idCol))
      .withColumn("bucket", (Sampling.hash32(col("tok")) % nBuckets).cast("int"))
      .repartition(nBuckets, col("bucket"))
      // tok-SORTED within each bucket file: a query's In(tok) data
      // filter skips row groups via tight min/max stats (the same trick
      // as the ANN layouts' cell2 sort)
      .sortWithinPartitions("bucket", "tok")
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    dl.write.mode("overwrite").parquet(s"$dir/doclen")
    // nBuckets rides in the stats row: append/serve READ it, so a
    // mismatched caller parameter cannot silently bucket new postings
    // differently (wrong-dir appends) or prune serving reads to the
    // wrong directories (silently missing docs)
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("n_buckets", lit(nBuckets))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** The layout's bucket count, from the stats sidecar. */
  def postingsBuckets(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/stats").select("n_buckets").collect()(0).getInt(0)

  /**
   * Incremental index maintenance: tokenize ONLY `newDocs` and append
   * their postings into the same bucket directories; doc lengths append
   * likewise, and the stats row is replaced by exact long addition of
   * the stored sums and the new docs' sums — the indexed corpus is
   * never rescanned, so an ingest window costs O(new data) like
   * [[statsIndexIncremental]]. Serving after an append is identical to
   * a full rebuild over the union (`LayoutSpec` pins score equality).
   * Caller contract: `newDocs` ids are new (re-indexing an id would
   * double its postings — run a [[graft.ops.CorpusDiff]] first when in
   * doubt).
   */
  def postingsAppend(newDocs: DataFrame, dir: String,
                     idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val nBuckets = postingsBuckets(spark, dir) // the layout's, never a guess
    val toks = newDocs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "")
    val dl = newDocs.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("dl"))
    toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
      .join(dl, Seq(idCol)) // dl denormalized, same as postingsWrite
      .withColumn("bucket", (Sampling.hash32(col("tok")) % nBuckets).cast("int"))
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions("bucket", "tok") // per-file row-group stats stay tight
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
    dl.write.mode("append").parquet(s"$dir/doclen")
    val old = spark.read.parquet(s"$dir/stats")
      .select("n_docs", "sum_dl").collect()(0)
    // coalesce: sum over zero rows aggregates to null (empty newDocs is
    // a legal no-op append, not an NPE)
    val fresh = dl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).collect()(0)
    import spark.implicits._
    val stats = Seq((old.getLong(0) + fresh.getLong(0), old.getLong(1) + fresh.getLong(1), nBuckets))
      .toDF("n_docs", "sum_dl", "n_buckets")
    // sibling-dir + rename (compactIndex's dance): the read-then-overwrite
    // of the stats row must not be able to crash into a stats-less layout
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/stats.new")
    val bak = new org.apache.hadoop.fs.Path(s"$dir/stats.old")
    fs.delete(tmp, true)
    stats.write.parquet(tmp.toString)
    fs.delete(bak, true)
    if (!fs.rename(dst, bak) || !fs.rename(tmp, dst))
      sys.error(s"postingsAppend: stats rename failed for $dir")
    fs.delete(bak, true)
  }

  /**
   * Small-file compaction for a postings layout: every [[postingsAppend]]
   * lands one parquet file set per bucket directory (plus one under
   * `doclen`), so a layout ingesting a window every few minutes
   * accumulates files forever — at 100 TB that is the classic
   * small-file death spiral (open/seek cost dwarfs byte cost, NameNode/
   * listing pressure grows unbounded). This OPTIMIZE-style maintenance
   * job rewrites `postings` back to `filesPerBucket` files per bucket
   * and `doclen` to ~`rowsPerFile` rows per file, then swaps each
   * directory into place with the same rename dance as the stats
   * rewrite (a crash leaves either the old or the new layout, never a
   * half-compacted one). Contents are byte-identical for serving —
   * `LayoutSpec` pins score parity and the file-count drop — and the
   * stats sidecar is untouched (row counts don't change), so appends
   * keep working after compaction.
   */
  def postingsCompact(spark: SparkSession, dir: String,
                      filesPerBucket: Int = 1,
                      rowsPerFile: Long = 4000000L): Unit = {
    require(filesPerBucket > 0 && rowsPerFile > 0, "positive targets required")
    val nBuckets = postingsBuckets(spark, dir)
    // shuffle keyed on (bucket, tok-salt mod filesPerBucket): a bucket's
    // rows land in at most filesPerBucket distinct tasks, so partitionBy
    // writes at most filesPerBucket files into each bucket directory.
    // (Keying on raw tok would spread one bucket over every task and
    // FAN OUT files instead of compacting them.)
    spark.read.parquet(s"$dir/postings")
      .withColumn("__salt",
        pmod(Sampling.hash32(col("tok")), lit(filesPerBucket)).cast("int"))
      .repartition(nBuckets * filesPerBucket, col("bucket"), col("__salt"))
      .drop("__salt")
      .sortWithinPartitions("bucket", "tok") // restore tight tok row-group stats
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings.compact")
    val nDocs = spark.read.parquet(s"$dir/stats")
      .select("n_docs").collect()(0).getLong(0)
    val dlParts = math.max(1L, (nDocs + rowsPerFile - 1) / rowsPerFile).toInt
    spark.read.parquet(s"$dir/doclen")
      .repartition(dlParts)
      .write.mode("overwrite").parquet(s"$dir/doclen.compact")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    swapDir(fs, s"$dir/postings")
    swapDir(fs, s"$dir/doclen")
  }

  /** Atomically promote `<path>.compact` over `<path>` (old → `.old`,
    * compact → live, drop `.old`). */
  private def swapDir(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val next = new org.apache.hadoop.fs.Path(s"$path.compact")
    val bak = new org.apache.hadoop.fs.Path(s"$path.old")
    fs.delete(bak, true)
    if (!fs.rename(live, bak) || !fs.rename(next, live))
      sys.error(s"compact: directory swap failed for $path")
    fs.delete(bak, true)
  }

  /** Rewrite a cell-partitioned data dir back to one file per cell
    * (re-sorting `sortCols` within partitions so merged files keep
    * tight row-group stats), then [[swapDir]] it into place — the
    * ANN-layout half of the [[postingsCompact]] maintenance story.
    * `nParts` comes from LISTING the `partCol=` directory names, not a
    * distinct() scan of the data: compaction already pays one full
    * read for the rewrite, it must not pay a second one to size it.
    * `preSwap` runs after the `.compact` write, before the promotion
    * (sidecar carry-over for layouts whose data dir is the root). */
  private def compactPartitioned(spark: SparkSession, path: String,
                                 partCol: String, sortCols: Seq[String],
                                 preSwap: org.apache.hadoop.fs.FileSystem => Unit = _ => ()): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val nParts = math.max(1, fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(s => s.isDirectory && s.getPath.getName.startsWith(s"$partCol=")))
    val out = spark.read.parquet(path).repartition(nParts, col(partCol))
    val sorted =
      if (sortCols.nonEmpty) out.sortWithinPartitions(sortCols.map(col): _*) else out
    sorted.write.mode("overwrite").partitionBy(partCol).parquet(s"$path.compact")
    preSwap(fs)
    swapDir(fs, path)
  }

  /** Small-file compaction for an [[ivfWrite]] layout (the data dir IS
    * the layout root, so the centroid sidecar is carried into the
    * compacted dir before the swap). Serving parity and
    * append-after-compact are spec-pinned for all four ANN compacts. */
  def ivfCompact(spark: SparkSession, dir: String): Unit =
    compactPartitioned(spark, dir, "cell", Nil, preSwap = fs =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$dir/_centroids.tsv"), fs,
        new org.apache.hadoop.fs.Path(s"$dir.compact/_centroids.tsv"),
        false, spark.sessionState.newHadoopConf()): Unit)

  /** Small-file compaction for a [[pqWrite]] layout's codes dir. */
  def pqCompact(spark: SparkSession, dir: String): Unit =
    compactPartitioned(spark, s"$dir/codes", "cell", Nil)

  /** Small-file compaction for an [[imiWrite]] layout's data dir, in
    * the layout's own partition regime: fused pair dirs need no re-sort
    * (a dir holds one pair); cell1 dirs re-sort (cell1, cell2) ≡ pair
    * so the merged files' row-group stats stay tight. */
  def imiCompact(spark: SparkSession, dir: String): Unit =
    compactImiPartitioned(spark, s"$dir/data")

  /** Small-file compaction for an [[imiPqWrite]] layout's codes dir. */
  def imiPqCompact(spark: SparkSession, dir: String): Unit =
    compactImiPartitioned(spark, s"$dir/codes")

  private def compactImiPartitioned(spark: SparkSession, path: String): Unit =
    imiPartCol(spark, path) match {
      case "pair" => compactPartitioned(spark, path, "pair", Nil)
      case _ => compactPartitioned(spark, path, "cell1", Seq("cell1", "cell2"))
    }

  /** Parquet data files under a layout subdirectory (recursive; excludes
    * _SUCCESS etc.) — the compaction gate's measurement. */
  def dataFileCount(spark: SparkSession, path: String): Int =
    spark.read.parquet(path).inputFiles.length

  /** The bucket a term's postings live in (driver-side twin of the
    * writer's `hash32 % nBuckets`). */
  def postingsBucket(term: String, nBuckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = md.take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % nBuckets).toInt
  }

  /**
   * BM25 over a [[postingsWrite]] layout: identical scores to
   * [[TextAnalysis.bm25]] (same expression shapes, exact avgdl from the
   * stored long sums), but the corpus scan is replaced by a
   * bucket-pruned postings read — `bucket IN (query buckets)` is a
   * partition filter, `tok IN (terms)` prunes within the bucket.
   */
  def bm25FromLayout(spark: SparkSession, dir: String, query: Seq[String],
                     k1: Double = 1.2, b: Double = 0.75,
                     idCol: String = "doc_id"): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    val nBuckets = postingsBuckets(spark, dir) // the layout's, never a guess
    val buckets = query.map(postingsBucket(_, nBuckets)).distinct
    // dl rides IN the postings row (denormalized at build/append time),
    // so serving never joins the corpus-sized doclen table: that join
    // shuffled every matching posting against ALL doc lengths (measured
    // at 5M docs / 11.6M matching postings: 6.85 → 5.49 s, and it was
    // the only corpus-sized input on the serve path — the structural
    // bound at 100 TB, where a doclen join side cannot exist). What
    // remains is O(matching postings): the per-doc score aggregation.
    val tf = spark.read.parquet(s"$dir/postings")
      .where(col("bucket").isin(buckets: _*) && col("tok").isin(query: _*))
      .select(col(idCol), col("tok"), col("tf"), col("dl"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = spark.read.parquet(s"$dir/stats")
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val perTerm = tf
      .join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("term_score",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    perTerm.groupBy(col(idCol), col("dl"))
      .agg(round(sum(col("term_score")), 6).as("score"))
  }

  /** Min/max stats index over a parquet directory: one row per file,
    * (file, <c>_min, <c>_max) for each indexed column. Built with one
    * scan (an OPTIMIZE/ANALYZE-style maintenance job, not a query-time
    * cost); the result is small enough to collect or broadcast. */
  def statsIndex(spark: SparkSession, dataDir: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental index maintenance: stat ONLY files not yet indexed and
    * union with the prior index (dropping rows for deleted files). At
    * scale this is the difference between an O(new data) maintenance
    * tick after every ingest window and an O(table) rescan. */
  def statsIndexIncremental(spark: SparkSession, dataDir: String,
                            prior: DataFrame, cols: Seq[String]): DataFrame = {
    val current = spark.read.parquet(dataDir).inputFiles.toSet
    val known = prior.select("file").collect().map(_.getString(0)).toSet
    val fresh = (current -- known).toSeq.sorted
    val kept = prior.where(col("file").isin(current.toSeq: _*))
    if (fresh.isEmpty) kept
    else {
      val aggs = cols.flatMap(c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
      val freshStats = spark.read.parquet(fresh: _*)
        .groupBy(input_file_name().as("file"))
        .agg(aggs.head, aggs.tail: _*)
      kept.unionByName(freshStats)
    }
  }

  /** Range-pruned read: scan only files whose [min,max] interval for
    * `column` intersects [lo, hi], then apply the exact filter. Result
    * is identical to filtering the full scan; only the I/O differs.
    * Returns (dataframe, filesRead, filesTotal). */
  /**
   * Rendezvous (highest-random-weight) shard routing: key → the shard
   * whose `md5(key ":" shard)` is lexicographically largest. The
   * placement function behind minimal-movement resharding: growing
   * n → n+1 shards moves ONLY the keys the new shard wins (≈ 1/(n+1)
   * of them), and every moved key lands on the NEW shard — no
   * shard-to-shard churn, unlike `hash(key) % n` which relocates
   * (n−1)/n of all keys (`LayoutSpec` pins both properties). Use it to
   * route documents to bucketed tables, state-store partitions, or
   * downstream services that must survive fleet growth.
   *
   * A narrow codegen'd projection (n md5s + an array_max over (hash,
   * shard) structs — ties impossible, md5 collisions aside); no RNG
   * state, engine-portable (the SQL oracle is DuckDB's `arg_max` over
   * the same strings).
   */
  def shardRoute(key: Column, nShards: Int): Column = {
    require(nShards > 0, "need at least one shard")
    array_max(array((0 until nShards).map(s =>
      struct(md5(concat(key.cast("string"), lit(":" + s))).as("h"),
        lit(s).as("shard"))): _*)).getField("shard")
  }

  def prunedRead(spark: SparkSession, dataDir: String, index: DataFrame,
                 column: String, lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val total = index.count().toInt
    val files = index
      .where(!(col(s"${column}_max") < lo || col(s"${column}_min") > hi))
      .select("file").collect().map(_.getString(0))
    val df =
      if (files.isEmpty)
        spark.read.parquet(dataDir).where(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
    (df.where(col(column) >= lo && col(column) <= hi), files.length, total)
  }
}

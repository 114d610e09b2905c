package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Learned byte-pair-encoding merge tables — the canonical tokenizer-prep
 * pass of a pretraining pipeline (Sennrich et al., "Neural Machine
 * Translation of Rare Words with Subword Units", ACL 2016): iteratively
 * merge the most-frequent adjacent symbol pair, exact integer counts,
 * deterministic tie-break, fixed iteration count.
 *
 * Engine-portable core trick: a word's tokenization state is a string of
 * symbols joined by DOUBLE spaces and wrapped in single spaces
 * (`"key"` → `" k  e  y "`). One BPE merge (l, r) → lr is then exactly
 * one non-overlapping left-to-right string replace of `" l  r "` with
 * `" lr "` — which is the semantics of `replace` in BOTH Spark
 * (codegen'd `StringReplace`) and ANSI SQL/DuckDB, and coincides with
 * Sennrich's leftmost-first greedy application. The wrap invariant
 * (single space at word edges, double between symbols) is preserved by
 * every replace, so merges compose by plain expression nesting and the
 * oracle can replay the FULL training loop in generated SQL — a
 * hash-match check of iterative BPE, not a contract flag.
 *
 * Scale shape (100 TB): one corpus-scale pass (word count: explode +
 * hash aggregate, map-side combinable) reduces to the vocab-sized
 * word-frequency table; all `nMerges` training iterations then run over
 * that vocab table (one interpreted pair-explode + hash aggregate + a
 * ONE-ROW argmax collect each, `localCheckpoint` truncating lineage).
 * Application is a narrow per-row expression (nested codegen'd
 * replaces) — no shuffle, runs at parquet-scan speed.
 */
object Bpe {

  /** Words for training: lowercase letter runs (mirrors the oracle's
    * `regexp_extract_all(lower(text), '[a-z]+')`).
    *
    * INVARIANT the hybrid merge loop depends on: symbols are strictly
    * ASCII `[a-z]`, so Java `String.compareTo` (driver-local argmax
    * tie-break) and Spark's `UTF8String` binary ordering agree. Widening
    * this alphabet beyond single-byte code points requires re-validating
    * the local ≡ distributed equivalence in [[train]] / `BpeSpec`. */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Initial symbol state of a single word: chars joined by double
    * spaces, wrapped in single spaces (`"key"` → `" k  e  y "`). */
  def initState(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", " $1 "), lit(" "))

  /** One merge applied to a state column (leftmost-first, non-overlapping
    * — exactly Sennrich's greedy order). */
  def applyMerge(state: Column, l: String, r: String): Column =
    replace(state, lit(s" $l  $r "), lit(s" $l$r "))

  /** A learned merge: rank is 1-based selection order. */
  final case class Merge(rank: Int, l: String, r: String, count: Long)

  /**
   * Train a BPE merge table over `docs(textCol)`: `nMerges` iterations,
   * each selecting the adjacent symbol pair with the highest exact
   * corpus count (ties broken by (left, right) ascending — total order,
   * engine-independent). Stops early only if no pair remains.
   *
   * HYBRID placement of the merge loop: the corpus-scale work (word
   * count) always runs distributed and reduces to a vocab-sized
   * (freq, state) table. When that table fits comfortably on the driver
   * (`localVocabThreshold` rows — a production tokenizer corpus has a
   * few million distinct words; the states are short strings), the
   * nMerges iterations run DRIVER-LOCAL over the collected table:
   * identical counts, tie-breaks, and replace semantics
   * (`BpeSpec` pins local ≡ distributed), but one merge costs an
   * incremental pair-count update over the affected words instead of a
   * Spark job + one-row collect. Measured at sf0.1 (vocab saturates at
   * 89 merges): hybrid 4.0 s end-to-end vs 12.7 s distributed,
   * identical outputs; at production merge counts on a 100k-word vocab
   * the incremental loop with the lazy-heap argmax runs 10000 merges in
   * ~11 s and 30000 in ~12 s (SCALING.md) where the distributed loop
   * would be that many sequential driver round-trips. Corpora whose vocab genuinely
   * exceeds the threshold keep the distributed loop, where a
   * vocab-sized shuffle per merge is the correct cost.
   */
  def train(docs: DataFrame, textCol: String = "text",
            nMerges: Int = 20,
            localVocabThreshold: Long = 2000000L): Seq[Merge] = {
    // the probe is a limit(threshold + 1), which is an Int in Spark's
    // API — a larger threshold would overflow to a negative/small limit
    // and silently misroute giant vocabs to the driver-local loop
    require(localVocabThreshold >= 0 && localVocabThreshold < Int.MaxValue,
      s"localVocabThreshold must be in [0, ${Int.MaxValue}): $localVocabThreshold")
    // corpus-scale pass #1: word frequencies (vocab-sized result)
    val vocab = vocabOf(docs, textCol)
    val probe = vocab.limit(localVocabThreshold.toInt + 1).count()
    if (probe <= localVocabThreshold)
      trainLocal(
        vocab.collect().map(r => (r.getLong(0), r.getString(1))).toSeq, nMerges)
    else trainDistributed(vocab, nMerges)
  }

  /** The corpus-scale word-frequency pass: reduces `docs` to the
    * vocab-sized (freq, state) table both merge loops train over. */
  private[ops] def vocabOf(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), initState(col("word")).as("state"))
      .localCheckpoint()

  /** The distributed merge loop: one pair-count job + one-row argmax
    * collect per merge over the (already vocab-sized) state table. */
  private[ops] def trainDistributed(vocab0: DataFrame, nMerges: Int): Seq[Merge] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val toks = split(trim(col("state")), "  ")
      val best = vocab
        .select(col("freq"), toks.as("toks"))
        .where(size(col("toks")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => struct(element_at(col("toks"), i + 1).as("l"),
                        element_at(col("toks"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        vocab = vocab
          .select(col("freq"), applyMerge(col("state"), l, r).as("state"))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** The driver-local merge loop over a collected (freq, state) vocab,
    * with INCREMENTAL pair-count maintenance (Sennrich's indexed
    * trainer): pair counts live in a hash map and each merge updates
    * only the words that actually contain the merged pair, so one merge
    * costs O(affected words), not a full vocab rescan. The naive rescan
    * measured 193 s for 1000 merges on a 100k-word vocab (~0.19 s/merge,
    * linear in nMerges × vocab — a production 30k-merge run would be
    * ~1.6 h); the numbers in SCALING.md justify the bookkeeping.
    *
    * Result-identical to the distributed loop (spec-pinned on three
    * corpora + a synthetic random vocab):
    *  - token split mirrors Spark `split(trim(state), "  ")`;
    *  - counts are exact integer deltas of the full recount (add word's
    *    pairs on entry, subtract before rewrite, re-add after), so the
    *    map always equals the naive recount;
    *  - argmax by (cnt desc, l asc, r asc) — Java String compareTo and
    *    Spark's UTF8String binary ordering agree on [a-z] symbols;
    *  - token-level merge application (scan left-to-right, fuse
    *    l,r → lr, skip 2) = `String.replace` on the state encoding =
    *    Spark `replace` = leftmost-first non-overlapping. */
  private[graft] def trainLocal(vocab0: Seq[(Long, String)], nMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val freqs = vocab0.map(_._1).toArray
    val words: Array[Array[String]] =
      vocab0.map(_._2.trim.split("  ")).toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair → indices of words that contained it when last touched; may
    // hold STALE indices (cheap skip on re-check) but never misses a
    // word containing the pair — entries are only added, never removed
    val index = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // lazy max-heap over (cnt, l, r) for the per-merge argmax: every
    // count CHANGE pushes the pair's new exact value, so the live
    // maximum is always present; stale entries (stored cnt ≠ current
    // map value) are discarded on pop. Replaces an O(#distinct pairs)
    // map scan per merge — the dominant cost once updates are
    // incremental (argmax was ~2/3 of the 10k-merge wall, SCALING.md).
    // Heap rank: higher cnt first, then SMALLER l, then smaller r —
    // exactly the (cnt desc, l asc, r asc) selection order.
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val lc = b._2.compareTo(a._2)
          if (lc != 0) lc else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)

    def addWord(i: Int, sign: Long): Unit = {
      val w = words(i); val f = freqs(i) * sign
      var j = 0
      while (j < w.length - 1) {
        val key = (w(j), w(j + 1))
        val c = counts.getOrElse(key, 0L) + f
        if (c == 0L) counts.remove(key)
        else {
          counts.update(key, c)
          heap.enqueue((c, key._1, key._2))
        }
        if (sign > 0) index.getOrElseUpdate(key, mutable.HashSet.empty) += i
        j += 1
      }
    }
    /** Pop stale entries until the top's stored count matches the live
      * map — that entry is the exact (cnt desc, l asc, r asc) argmax. */
    def popMax(): Option[((String, String), Long)] = {
      while (heap.nonEmpty) {
        val (c, l, r) = heap.head
        if (counts.getOrElse((l, r), 0L) == c) return Some(((l, r), c))
        heap.dequeue()
      }
      None
    }
    def fuse(toks: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuilder.make[String]
      var j = 0
      while (j < toks.length) {
        if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
          out += l + r; j += 2
        } else { out += toks(j); j += 1 }
      }
      out.result()
    }
    def containsPair(toks: Array[String], l: String, r: String): Boolean = {
      var j = 0
      while (j < toks.length - 1) {
        if (toks(j) == l && toks(j + 1) == r) return true
        j += 1
      }
      false
    }

    var i = 0
    while (i < words.length) { addWord(i, 1L); i += 1 }

    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      popMax() match {
        case None => exhausted = true
        case Some(((l, r), cnt)) =>
          merges += Merge(rank, l, r, cnt)
        val affected = index.getOrElse((l, r), mutable.HashSet.empty).toArray
        affected.foreach { i =>
          if (containsPair(words(i), l, r)) { // skip stale index entries
            addWord(i, -1L)
            words(i) = fuse(words(i), l, r)
            addWord(i, 1L)
          }
        }
        index.remove((l, r))
        rank += 1
      }
    }
    merges.result()
  }

  /**
   * Whole-document tokenization state under a merge table, as one narrow
   * expression. Word boundaries become `|` so no `" l  r "` pattern can
   * span them (symbols are strictly `[a-z]+`); per-word wrap invariants
   * hold on both sides of each `|`. Assumes `textCol` is lowercase
   * words separated by single spaces (the documents-table shape); for
   * arbitrary text, tokenize to words first and apply per word.
   */
  def encodeState(text: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(
      regexp_replace(replace(lower(text), lit(" "), lit("|")), "([a-z])", " $1 ")
    )((st, m) => applyMerge(st, m.l, m.r))

  /** BPE token count of a doc = #double-space symbol gaps + #words
    * (each word contributes gaps+1 symbols; gaps are the only double
    * spaces in the state — word joints are `" | "`). */
  /** [[tokenCountAfter]] as one memoized codegen'd call per document
    * ([[graft.functions.BpeTokenCount]]) — value-identical (spec-pinned
    * and oracle-checked), without rebuilding the 3×-expanded state
    * string once per merge. Word memo makes Zipf-distributed corpora
    * nearly O(distinct words). */
  def tokenCountFast(text: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeTokenCount(text,
      merges.sortBy(_.rank).map(m => (m.l, m.r)))

  def tokenCountAfter(text: Column, merges: Seq[Merge]): Column = {
    val st = encodeState(text, merges)
    val gaps = (length(st) - length(replace(st, lit("  "), lit(" ")))).cast("long")
    val nWords = when(length(text) === 0, lit(0L))
      .otherwise((length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast("long"))
    when(length(text) === 0, lit(0L)).otherwise(gaps + nWords)
  }

  // ───────────────────────── oracle SQL generation ─────────────────────────

  /** The training loop unrolled as DuckDB CTEs: `s0..s<n>` are vocab
    * states, `m1..m<n>` the per-iteration argmax pairs. Mirrors
    * [[train]] exactly (same tokenization, counts, tie-break, replace
    * semantics). `MATERIALIZED` is load-bearing: each `s_i` references
    * `s_{i-1}` (directly and via `m_i`'s scalar subqueries), so inlined
    * CTE expansion is exponential in the chain depth — materialization
    * makes the replay linear, exactly like the Spark side's per-round
    * `localCheckpoint`. */
  def oracleCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS MATERIALIZED (
      |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |        FROM documents) GROUP BY w),
      |s0 AS MATERIALIZED (SELECT freq,
      |  ' ' || regexp_replace(word, '(.)', ' \1 ', 'g') || ' ' AS state FROM w0)""".stripMargin
    for (i <- 1 to nMerges) {
      val prev = s"s${i - 1}"
      sb ++= s""",
        |m$i AS MATERIALIZED (
        |  SELECT p[1] AS l, p[2] AS r, cnt FROM (
        |    SELECT p, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT freq, unnest(list_transform(generate_series(1, len(toks)-1),
        |        i -> [toks[i], toks[i+1]])) AS p
        |      FROM (SELECT freq, string_split(trim(state), '  ') AS toks FROM $prev)
        |      WHERE len(toks) >= 2) GROUP BY p)
        |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |s$i AS MATERIALIZED (SELECT freq, replace(state,
        |  ' ' || (SELECT l FROM m$i) || '  ' || (SELECT r FROM m$i) || ' ',
        |  ' ' || (SELECT l FROM m$i) || (SELECT r FROM m$i) || ' ') AS state FROM $prev)""".stripMargin
    }
    sb.result()
  }

  /** Full oracle for the merge table: replays training, emits
    * (merge_rank, lhs, rhs, merged, pair_count). */
  def trainOracleSql(nMerges: Int): String = {
    val rows = (1 to nMerges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, l || r AS merged, cnt AS pair_count FROM m$i")
      .mkString("\n  UNION ALL ")
    s"${oracleCtes(nMerges)}\nSELECT * FROM (\n  $rows\n) ORDER BY merge_rank"
  }

  /** Oracle for per-doc token counts: replays training, then applies the
    * learned merges to each doc with the same nested replaces. */
  def tokensOracleSql(nMerges: Int): String = {
    val init = "regexp_replace(replace(lower(text), ' ', '|'), '([a-z])', ' \\1 ', 'g')"
    val applied = (1 to nMerges).foldLeft(init)((st, i) =>
      s"replace($st,\n    ' ' || (SELECT l FROM m$i) || '  ' || (SELECT r FROM m$i) || ' ',\n    ' ' || (SELECT l FROM m$i) || (SELECT r FROM m$i) || ' ')")
    s"""${oracleCtes(nMerges)}
      |SELECT doc_id,
      |  CAST(CASE WHEN len(text) = 0 THEN 0 ELSE
      |    len(st) - len(replace(st, '  ', ' '))
      |    + len(text) - len(replace(text, ' ', '')) + 1 END AS BIGINT) AS n_bpe
      |FROM (SELECT doc_id, text, $applied AS st FROM documents)
      |ORDER BY doc_id""".stripMargin
  }
}

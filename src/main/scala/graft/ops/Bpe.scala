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
    * `regexp_extract_all(lower(text), '[a-z]+')`). */
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
   */
  def train(docs: DataFrame, textCol: String = "text",
            nMerges: Int = 20): Seq[Merge] = {
    // corpus-scale pass #1: word frequencies (vocab-sized result)
    var vocab = docs
      .select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), initState(col("word")).as("state"))
      .localCheckpoint()
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

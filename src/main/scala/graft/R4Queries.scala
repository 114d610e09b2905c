package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.{Contamination, Dedup, Mixing, Packing, TextAnalysis}

/**
 * Round-4 coverage: training-data pipeline operators (benchmark
 * contamination, sequence packing, domain-mixture budgeting, PII-style
 * redaction, intra-doc repetition removal, incremental cross-corpus
 * dedup) and relational gaps (gaps-and-islands, RANGE window frames,
 * NOT IN three-valued-logic semantics, array/map function families,
 * higher-moment statistics).
 *
 * Oracle discipline unchanged from earlier rounds: exact integer/DECIMAL
 * arithmetic everywhere, one double division per emitted ratio, BIGINT
 * casts on counts, deterministic ORDER BY in both engines.
 */
object R4Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Deterministic eval/train split for the contamination check:
    * every 97th doc plays the held-out benchmark. */
  private def isEval(c: Column): Column = c % 97 === 0

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](

    // ── Benchmark contamination (n-gram overlap vs a held-out set) ─────
    "q_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Contamination.flagOverlap(
          docs.where(!isEval(col("doc_id"))),
          docs.where(isEval(col("doc_id"))), n = 8)
        .orderBy("doc_id")
    }),

    // ── Sequence packing (concat-and-chunk; two-phase prefix sum) ──────
    "q_pack_sequences" -> ((s, dir) =>
      Packing.packedSpans(t(s, dir, "documents"), seqLen = 512)
        .orderBy("doc_id")),

    // ── Domain-mixture token budget (water-fill cap at 60% of corpus) ──
    "q_mix_budget" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(col("source").as("domain"))
        .agg(sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"))
      val budget = expr("sum(n_tokens) OVER () * 3 div 5")
      Mixing.waterfillBudget(counts.withColumn("__b", budget), col("__b"))
        .select("domain", "n_tokens", "alloc", "capped", "share")
        .orderBy("domain")
    }),

    // ── Temperature mixture weights (α = 0.5 over the same domains) ────
    "q_mix_temperature" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(col("source").as("domain"))
        .agg(sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"))
      val budget = expr("sum(n_tokens) OVER () * 3 div 5")
      Mixing.temperatureWeights(counts.withColumn("__b", budget), alpha = 0.5, col("__b"))
        .orderBy("domain")
    }),

    // ── Mixture materialization (epochs schedule → doc copy counts) ────
    "q_mix_materialize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val counts = docs.groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"))
      val budget = expr("sum(n_tokens) OVER () * 3 div 5")
      val rates = Mixing.temperatureWeights(
          counts.withColumn("__b", budget), alpha = 0.5, col("__b"),
          keyCol = "source")
        .select(col("source"), col("epochs").as("rate"))
      Mixing.materializeMixture(docs, rates)
        .orderBy("doc_id")
    }),

    // ── PII-style redaction (digit scrub over the events props JSON) ───
    "q_pii_scrub" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          TextAnalysis.redact(col("props"), "[0-9]+", "#").as("scrubbed"),
          TextAnalysis.matchedChars(col("props"), "[0-9]").as("n_digits"),
          size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_runs"))
        .orderBy("event_id")),

    // ── Intra-document repetition removal (tumbling 8-token windows) ───
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(t(s, dir, "documents"), windowTokens = 8)
        .orderBy("doc_id")),

    // ── Incremental cross-corpus dedup (batch admission gate) ──────────
    "q_cross_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.dedupAgainst(
          docs.where(col("doc_id") % 10 === 7),
          docs.where(col("doc_id") % 10 =!= 7))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // ── Gaps-and-islands: per-user consecutive-active-day streaks ──────
    "q_islands" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val days = t(s, dir, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val grp = days.withColumn("grp", col("day") - row_number().over(w))
      val streaks = grp.groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
      streaks.groupBy("user_id")
        .agg(sum("len").as("n_days"),
             count(lit(1)).as("n_streaks"),
             max("len").as("max_streak"),
             // earliest start among maximal streaks (scalar-key argmax:
             // DuckDB max_by takes no struct keys — composite integer)
             max_by(col("start_day"), col("len") * 1000000L - col("start_day"))
               .as("max_streak_start"))
        .orderBy("user_id")
    }),

    // ── RANGE window frame: 7-day sliding sum over sparse daily series ──
    "q_window_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val D = DecimalType(18, 2)
      val daily = t(s, dir, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
          col("value").cast(D).as("v"))
        .groupBy("user_id", "day").agg(sum("v").as("dsum"))
      // RANGE, not ROWS: the frame is day-valued, so gaps in the series
      // fall out of the window even though no row carries them
      val w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
      daily.where(col("user_id") < 40)
        .select(col("user_id"), col("day"),
          col("dsum").cast("double").as("day_value"),
          sum(col("dsum")).over(w).cast("double").as("win7"))
        .orderBy("user_id", "day")
    }),

    // ── NOT IN vs NOT EXISTS under NULLs (three-valued logic) ──────────
    "q_not_in_null" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("nin_customer")
      t(s, dir, "orders").createOrReplaceTempView("nin_orders")
      s.sql("""
        |SELECT
        |  CAST((SELECT count(*) FROM nin_customer
        |        WHERE c_custkey NOT IN (SELECT o_custkey FROM nin_orders)) AS BIGINT)
        |    AS n_not_in,
        |  CAST((SELECT count(*) FROM nin_customer
        |        WHERE c_custkey NOT IN
        |          (SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey END
        |           FROM nin_orders)) AS BIGINT) AS n_not_in_null,
        |  CAST((SELECT count(*) FROM nin_customer c
        |        WHERE NOT EXISTS (SELECT 1 FROM nin_orders o
        |                          WHERE o.o_custkey = c.c_custkey
        |                            AND o.o_totalprice > 100000)) AS BIGINT)
        |    AS n_not_exists
        """.stripMargin)
    }),

    // ── Array function family over tokenized text ──────────────────────
    "q_array_funcs" -> ((s, dir) =>
      t(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n"),
          size(array_distinct(col("ws"))).cast("long").as("n_uniq"),
          element_at(array_sort(col("ws")), 1).as("first_sorted"),
          element_at(array_sort(col("ws")), -1).as("last_sorted"),
          array_contains(col("ws"), "the").cast("int").as("has_the"),
          coalesce(nullif(array_position(col("ws"), "data"), lit(0L)), lit(-1L))
            .as("pos_data"),
          array_join(slice(col("ws"), 1, 3), ",").as("head3"),
          element_at(col("ws"), -1).as("last_tok"),
          size(flatten(array(col("ws"), col("ws")))).cast("long").as("n_doubled"))
        .orderBy("doc_id")),

    // ── Map function family (word-count maps per document) ─────────────
    "q_map_funcs" -> ((s, dir) => {
      val wc = t(s, dir, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      wc.groupBy("doc_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("w"), col("cnt")))))
          .as("m"))
        .select(col("doc_id"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          coalesce(try_element_at(col("m"), lit("the")), lit(0L)).as("n_the"),
          size(map_keys(map_filter(col("m"), (_, v) => v >= 2))).cast("long")
            .as("n_repeated"),
          element_at(array_sort(map_keys(col("m"))), 1).as("first_key"),
          aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v)
            .as("n_tokens"))
        .orderBy("doc_id")
    }),

    // ── Higher-moment statistics from exact DECIMAL power sums ─────────
    // Same construction as q_stats_agg one moment up: s1..s4 are exact
    // DECIMAL sums (associative — safe at any parallelism), then ONE
    // fixed double formula; DECIMAL(8,2) keeps q^4 inside 38 digits.
    "q_skew_kurt" -> ((s, dir) => {
      val q = col("l_quantity").cast(DecimalType(8, 2))
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(q).cast("double").as("s1"),
          sum(q * q).cast("double").as("s2"),
          sum(q * q * q).cast("double").as("s3"),
          sum((q * q) * (q * q)).cast("double").as("s4"))
        .select(col("l_returnflag"), col("n"),
          (col("s1") / col("n")).as("mean_qty"),
          (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
            .as("var_qty"),
          ((col("s3") / col("n") - lit(3.0) * (col("s1") / col("n")) * (col("s2") / col("n"))
              + lit(2.0) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s1") / col("n"))) /
            ((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) *
              sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))))
            .as("skew_qty"),
          ((col("s4") / col("n") - lit(4.0) * (col("s1") / col("n")) * (col("s3") / col("n"))
              + lit(6.0) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s2") / col("n"))
              - lit(3.0) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s1") / col("n"))) /
            ((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) *
              (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))))
            .as("kurt_qty"))
        .orderBy("l_returnflag")
    })
  )

  /** Shared SQL fragment: word 8-gram md5 hashes per document (matches
    * TextAnalysis.shingles semantics incl. the short-doc whole-text case). */
  private val shingleCte =
    """ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN len(w) < 8 THEN text
      |             ELSE array_to_string(w[j:j+7], ' ') END) AS h
      |  FROM ws, unnest(CASE WHEN len(w) < 8 THEN [1::BIGINT]
      |                       ELSE range(1, len(w) - 6) END) AS t(j))""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_contamination" ->
      s"""WITH $shingleCte,
         |tr AS (SELECT DISTINCT doc_id, h FROM sh WHERE doc_id % 97 <> 0),
         |ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0)
         |SELECT tr.doc_id, count(*) AS n_shingles,
         |  CAST(count(ev.h) AS BIGINT) AS n_contaminated,
         |  CAST(CASE WHEN count(ev.h) > 0 THEN 1 ELSE 0 END AS INT) AS contaminated
         |FROM tr LEFT JOIN ev ON tr.h = ev.h
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) = 0 THEN 0
        |         ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS n_tokens
        |  FROM documents),
        |offs AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING), 0) - n_tokens AS BIGINT) AS start_off
        |  FROM toks)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, start_off,
        |  start_off + n_tokens - 1 AS end_off,
        |  start_off // 512 AS first_seq,
        |  (start_off + n_tokens - 1) // 512 AS last_seq,
        |  CASE WHEN n_tokens = 0 THEN 0
        |       ELSE (start_off + n_tokens - 1) // 512 - start_off // 512 + 1 END
        |    AS n_seqs
        |FROM offs ORDER BY doc_id""".stripMargin,

    "q_mix_temperature" ->
      """WITH counts AS (
        |  SELECT source AS domain,
        |    CAST(sum(CASE WHEN length(text) = 0 THEN 0
        |         ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT domain, n_tokens,
        |    pow(n_tokens::DOUBLE / (sum(n_tokens) OVER ()), 0.5) AS p,
        |    (sum(n_tokens) OVER ()) * 3 // 5 AS b
        |  FROM counts)
        |SELECT domain, n_tokens,
        |  round(p / sum(p) OVER (), 6) AS weight,
        |  CAST(floor(p / sum(p) OVER () * b) AS BIGINT) AS eff_tokens,
        |  round(p / sum(p) OVER () * b / n_tokens::DOUBLE, 6) AS epochs
        |FROM t ORDER BY domain""".stripMargin,

    "q_mix_materialize" ->
      """WITH counts AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN length(text) = 0 THEN 0
        |         ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT source, n_tokens,
        |    pow(n_tokens::DOUBLE / (sum(n_tokens) OVER ()), 0.5) AS p,
        |    (sum(n_tokens) OVER ()) * 3 // 5 AS b
        |  FROM counts),
        |r AS (
        |  SELECT source,
        |    round(p / sum(p) OVER () * b / n_tokens::DOUBLE, 6) AS rate
        |  FROM t),
        |j AS (
        |  SELECT d.doc_id, d.source,
        |    CAST(floor(rate) AS BIGINT) AS fl,
        |    CAST(floor((rate - floor(rate)) * 4294967296.0) AS BIGINT) AS thresh,
        |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT AS h
        |  FROM documents d JOIN r USING (source))
        |SELECT doc_id, source,
        |  fl + CASE WHEN h < thresh THEN 1 ELSE 0 END AS n_copies
        |FROM j WHERE fl + CASE WHEN h < thresh THEN 1 ELSE 0 END > 0
        |ORDER BY doc_id""".stripMargin,

    "q_mix_budget" ->
      """WITH counts AS (
        |  SELECT source AS domain,
        |    CAST(sum(CASE WHEN length(text) = 0 THEN 0
        |         ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |ranked AS (
        |  SELECT domain, n_tokens,
        |    (sum(n_tokens) OVER ()) * 3 // 5 AS b,
        |    count(*) OVER () AS k,
        |    row_number() OVER (ORDER BY n_tokens, domain) AS rn,
        |    coalesce(sum(n_tokens) OVER (ORDER BY n_tokens, domain
        |      ROWS UNBOUNDED PRECEDING), 0) - n_tokens AS cum_before
        |  FROM counts),
        |cand AS (
        |  SELECT *, (b - cum_before) // (k - rn + 1) AS cand,
        |    (b - cum_before) // (k - rn + 1) < n_tokens AS capped_here
        |  FROM ranked),
        |fcx AS (
        |  SELECT *, min(CASE WHEN capped_here THEN rn END) OVER () AS fc
        |  FROM cand),
        |lvl AS (
        |  SELECT *, max(CASE WHEN rn = fc THEN cand END) OVER () AS level
        |  FROM fcx)
        |SELECT domain, n_tokens,
        |  CAST(CASE WHEN fc IS NULL THEN n_tokens
        |       ELSE least(n_tokens, level) END AS BIGINT) AS alloc,
        |  CAST(CASE WHEN fc IS NOT NULL AND n_tokens > level THEN 1 ELSE 0 END AS INT)
        |    AS capped,
        |  CAST(CASE WHEN fc IS NULL THEN n_tokens
        |       ELSE least(n_tokens, level) END AS DOUBLE) / CAST(b AS DOUBLE) AS share
        |FROM lvl ORDER BY domain""".stripMargin,

    "q_pii_scrub" ->
      """SELECT event_id,
        |  regexp_replace(props, '[0-9]+', '#', 'g') AS scrubbed,
        |  CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT)
        |    AS n_digits,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_runs
        |FROM events ORDER BY event_id""".stripMargin,

    "q_repetition" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |chunks AS (
        |  SELECT doc_id,
        |    array_to_string(w[j:j+7], ' ') AS chunk,
        |    least(8, len(w) - j + 1) AS ctoks
        |  FROM ws, unnest(range(1, len(w) + 1, 8)) AS t(j)),
        |grouped AS (
        |  SELECT doc_id, chunk, count(*) AS occ, min(ctoks) AS ctoks
        |  FROM chunks GROUP BY doc_id, chunk)
        |SELECT doc_id,
        |  CAST(sum(occ) AS BIGINT) AS n_windows,
        |  count(*) AS n_kept,
        |  CAST(sum(ctoks * occ) AS BIGINT) AS toks_total,
        |  CAST(sum(ctoks) AS BIGINT) AS toks_kept,
        |  CAST(sum(ctoks * occ) - sum(ctoks) AS DOUBLE) /
        |    CAST(sum(ctoks * occ) AS DOUBLE) AS rep_ratio
        |FROM grouped GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_cross_dedup" ->
      """WITH fp AS (
        |  SELECT doc_id, n_chars, md5(trim(lower(text))) AS f,
        |    doc_id % 10 = 7 AS is_batch
        |  FROM documents),
        |seen AS (SELECT DISTINCT f FROM fp WHERE NOT is_batch),
        |fresh AS (
        |  SELECT b.doc_id, b.n_chars, b.f FROM fp b
        |  WHERE b.is_batch AND b.f NOT IN (SELECT f FROM seen)),
        |ranked AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rk
        |  FROM fresh)
        |SELECT doc_id, n_chars FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "q_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |grp AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, g, count(*) AS len, min(day) AS start_day
        |  FROM grp GROUP BY user_id, g)
        |SELECT user_id,
        |  CAST(sum(len) AS BIGINT) AS n_days,
        |  count(*) AS n_streaks,
        |  CAST(max(len) AS BIGINT) AS max_streak,
        |  CAST(max_by(start_day, len * 1000000 - start_day) AS BIGINT)
        |    AS max_streak_start
        |FROM streaks GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_window_range" ->
      """WITH daily AS (
        |  SELECT user_id,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    sum(CAST(value AS DECIMAL(18,2))) AS dsum
        |  FROM events GROUP BY user_id, day)
        |SELECT user_id, CAST(day AS BIGINT) AS day,
        |  CAST(dsum AS DOUBLE) AS day_value,
        |  CAST(sum(dsum) OVER (PARTITION BY user_id ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS win7
        |FROM daily WHERE user_id < 40 ORDER BY user_id, day""".stripMargin,

    "q_not_in_null" ->
      """SELECT
        |  CAST((SELECT count(*) FROM customer
        |        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS BIGINT)
        |    AS n_not_in,
        |  CAST((SELECT count(*) FROM customer
        |        WHERE c_custkey NOT IN
        |          (SELECT CASE WHEN o_totalprice > 100000 THEN o_custkey END
        |           FROM orders)) AS BIGINT) AS n_not_in_null,
        |  CAST((SELECT count(*) FROM customer c
        |        WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                          WHERE o.o_custkey = c.c_custkey
        |                            AND o.o_totalprice > 100000)) AS BIGINT)
        |    AS n_not_exists""".stripMargin,

    "q_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
        |  list_sort(w)[1] AS first_sorted,
        |  list_sort(w)[-1] AS last_sorted,
        |  CAST(CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END AS INT) AS has_the,
        |  CAST(coalesce(nullif(list_position(w, 'data'), 0), -1) AS BIGINT) AS pos_data,
        |  array_to_string(w[1:3], ',') AS head3,
        |  w[-1] AS last_tok,
        |  CAST(len(flatten([w, w])) AS BIGINT) AS n_doubled
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |      WHERE doc_id < 100)
        |ORDER BY doc_id""".stripMargin,

    "q_map_funcs" ->
      """WITH wc AS (
        |  SELECT doc_id, w, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents WHERE doc_id < 50)
        |  GROUP BY doc_id, w)
        |SELECT doc_id,
        |  count(*) AS n_keys,
        |  CAST(coalesce(sum(CASE WHEN w = 'the' THEN cnt END), 0) AS BIGINT) AS n_the,
        |  CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
        |  min(w) AS first_key,
        |  CAST(sum(cnt) AS BIGINT) AS n_tokens
        |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_skew_kurt" ->
      """WITH sums AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS s2,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS s3,
        |    CAST(CAST(sum((CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) * (CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2)))) AS VARCHAR) AS DOUBLE) AS s4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (s1 / n) AS mean_qty,
        |  (s2 / n - (s1 / n) * (s1 / n)) AS var_qty,
        |  ((s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n)) /
        |    ((s2 / n - (s1 / n) * (s1 / n)) * sqrt(s2 / n - (s1 / n) * (s1 / n))))
        |    AS skew_qty,
        |  ((s4 / n - 4.0 * (s1 / n) * (s3 / n) + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) /
        |    ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))))
        |    AS kurt_qty
        |FROM sums ORDER BY l_returnflag""".stripMargin
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Contamination, Similarity, TextAnalysis}

/**
 * Round-7 curation additions: the Gopher quality-rule bundle,
 * embedding-space decontamination, and fixed-centroid corpus
 * clustering — the remaining first-class passes of a production
 * pretraining-data pipeline (rule-attributed filtering, semantic
 * leakage gating, domain discovery).
 *
 * Oracle discipline follows the earlier registries: integer arithmetic
 * cross-multiplied instead of ratios wherever possible, float
 * expressions mirrored term-for-term (same association order, same
 * sequential sums) so DuckDB reproduces Spark bit-for-bit, one
 * round(,6) at the emission point, deterministic ORDER BY.
 */
object CurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Eval split for embedding decontamination: label 9 plays the
    * held-out benchmark (~10% of vectors). */
  private val EvalLabel = 9

  private val ContamThreshold = 0.4

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](

    // ── Gopher-style rule-attributed quality filter ────────────────────
    "q_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherReport(t(s, dir, "documents")).orderBy("doc_id")),

    // ── Embedding-space decontamination (semantic leakage gate) ────────
    "q_embed_contamination" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Contamination.embedOverlap(
          emb.where(col("label") =!= EvalLabel),
          emb.where(col("label") === EvalLabel),
          threshold = ContamThreshold)
        .orderBy("eval_id")
    }),

    // ── Fixed-centroid clustering (domain discovery) ───────────────────
    // Centroids are the first 8 corpus vectors — a deterministic seed
    // set both engines can reproduce; assignment is the narrow
    // broadcast-centroids pass of Similarity.assignCentroids.
    "q_embed_clusters" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.assignCentroids(emb, clusterSeeds(emb)).orderBy("vec_id")
    }),

    "q_cluster_sizes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.assignCentroids(emb, clusterSeeds(emb))
        .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
        .orderBy("cell")
    }),

    // ── Embedding outlier score (far-from-centroid curation gate) ──────
    // z-score of each vector's (rounded) squared centroid distance
    // within its cell. Float discipline: the rounded dist² is EXACT as
    // DECIMAL(18,6), the moment sums are exact decimal arithmetic
    // (order-independent), and the z expression is the single
    // double-math step — same shape both engines. The per-cell stats
    // are ≤ nCells rows and broadcast back onto the assignment.
    "q_embed_outliers" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // materialize the assignment once: both the stats aggregate and
      // the final join read it — without this the VecDotMulti corpus
      // pass runs twice (same reasoning as simhashNearPairs)
      val a = Similarity.assignCentroids(emb, clusterSeeds(emb)).localCheckpoint()
      val dec = col("dist2").cast(org.apache.spark.sql.types.DecimalType(18, 6))
      val stats = a.groupBy("cell").agg(
        count(lit(1)).as("n"), sum(dec).as("s"), sum(dec * dec).as("sxx"))
        .where(col("n") > 1)
      val mean = col("s").cast("double") / col("n")
      val variance = (col("sxx").cast("double") -
        col("s").cast("double") * col("s").cast("double") / col("n")) / (col("n") - 1)
      a.join(broadcast(stats), Seq("cell"))
        .select(col("vec_id"), col("cell"), col("dist2"),
          round((col("dist2") - mean) / sqrt(variance), 6).as("z"))
        .orderBy("vec_id")
    }),

    // ── BM25 ranked retrieval (inverted-index relevance) ───────────────
    "q_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(t(s, dir, "documents"), BmQuery)
        .orderBy(col("score").desc, col("doc_id")).limit(20)),

    // ── Naive Bayes domain classifier (model-based corpus tagging) ─────
    "q_nb_scores" -> ((s, dir) =>
      graft.ops.NaiveBayes.domainScores(t(s, dir, "documents"))
        .orderBy("doc_id", "label")),

    "q_nb_predict" -> ((s, dir) =>
      graft.ops.NaiveBayes.domainPredict(t(s, dir, "documents"))
        .orderBy("doc_id")),

    // ── PMI collocations (statistical phrase discovery) ────────────────
    "q_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(t(s, dir, "documents"), minCount = 20)
        .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(30)),

    // ── Reproducible epoch shuffle (no global sort) ────────────────────
    "q_epoch_shuffle" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val shuffled = graft.ops.Sampling.epochShuffle(
        t(s, dir, "documents").select("doc_id"), col("doc_id"), seed = 7, nShards = 16)
      shuffled.withColumn("rank_in_shard",
          row_number().over(Window.partitionBy("shard").orderBy("order_key", "doc_id")))
        .select("doc_id", "shard", "order_key", "rank_in_shard")
        .orderBy("doc_id")
    }),

    // ── Quantile-calibrated quality gate (top 30% per source) ──────────
    "q_quality_gate" -> ((s, dir) =>
      graft.ops.Sampling.topFractionByStratum(
          t(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              TextAnalysis.qualityScore(col("text")).as("quality")),
          stratum = col("source"), score = col("quality"),
          tieBreak = col("doc_id"), pct = 30)
        .orderBy("doc_id")),

    // ── HTML boilerplate strip (single-pass codegen'd expression) ──────
    // The corpus is plain text, so the crawl wrapper is minted
    // deterministically (tags, entities, an unterminated '<') with the
    // SAME concat/replace both engines run; the operator under test is
    // graft.functions.HtmlStrip vs the oracle's three-regex chain.
    "q_html_strip" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
          graft.functions.HtmlStrip(htmlWrap(col("text"))).as("clean"))
        .orderBy("doc_id"))
  )

  /** Pseudo-crawl wrapper: tags + entities + a trailing unterminated
    * `<` — every branch of the stripper in one value. Mirrored
    * verbatim by [[sqlHtmlWrap]]. */
  private def htmlWrap(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("<p id=\"1\">"),
      replace(text, lit(" a "), lit(" &amp; ")),
      lit("</p>"), lit("\n"),
      lit("<br/>&nbsp;&#39;end&#39; 2 < 3"))

  /** BM25 demo query terms (present in the synthetic vocabulary). */
  private val BmQuery = Seq("spark", "query", "merge")

  /** Collect the 8 seed centroids (bounded: 8 × 64 floats). */
  private def clusterSeeds(emb: DataFrame): Array[(Int, Array[Double])] =
    emb.where(col("vec_id") < 8).select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  // ── Oracle SQL ───────────────────────────────────────────────────────

  /** Naive Bayes score CTE body — mirrors NaiveBayes.domainScores term
    * for term: exact-count model, (c+1)/(L+V) smoothing as one double
    * division inside ln, per-doc sum of cnt·logp, prior added last,
    * round(,6) at emission. Shared by q_nb_scores and q_nb_predict. */
  private[graft] val sqlNbScoresBody: String =
    """WITH toks AS (SELECT doc_id, source AS lbl, t.tok
      |    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
      |    WHERE t.tok <> ''),
      |  ct AS (SELECT lbl, tok, count(*) AS c FROM toks GROUP BY lbl, tok),
      |  lt AS (SELECT lbl, count(*) AS l_total FROM toks GROUP BY lbl),
      |  vocab AS (SELECT DISTINCT tok FROM toks),
      |  vs AS (SELECT count(*) AS v FROM vocab),
      |  pri AS (SELECT source AS lbl, count(*) AS n_lbl FROM documents GROUP BY source),
      |  tot AS (SELECT count(*) AS n_all FROM documents),
      |  model AS (SELECT vocab.tok, lt.lbl,
      |      ln((coalesce(ct.c, 0) + 1)::DOUBLE / (lt.l_total + vs.v)::DOUBLE) AS logp
      |    FROM vocab CROSS JOIN lt
      |    LEFT JOIN ct ON ct.tok = vocab.tok AND ct.lbl = lt.lbl
      |    CROSS JOIN vs),
      |  dt AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY doc_id, tok),
      |  ll AS (SELECT dt.doc_id, model.lbl, sum(dt.cnt::DOUBLE * model.logp) AS s
      |    FROM dt JOIN model ON dt.tok = model.tok GROUP BY dt.doc_id, model.lbl)
      |SELECT ll.doc_id, ll.lbl AS label,
      |  round(ln(pri.n_lbl::DOUBLE / tot.n_all) + ll.s, 6) AS score
      |FROM ll JOIN pri ON ll.lbl = pri.lbl CROSS JOIN tot""".stripMargin

  private[graft] val sqlNbScores: String =
    sqlNbScoresBody + "\nORDER BY doc_id, label"

  private val sqlNTok =
    "CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END"
  private def sqlOcc(w: String) =
    s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) / ${w.length + 2}"
  private def sqlChar(c: Char) =
    s"(length(text) - length(replace(text, '$c', '')))"
  private def sqlDot(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> $a.embedding[i]::DOUBLE * $b.embedding[i]::DOUBLE))"

  def oracleSql: Map[String, String] = Map(

    "q_gopher_rules" -> {
      // stopword tokens via list_filter — token semantics, counting
      // adjacent repeats (mirrors TextAnalysis.gopherRules exactly)
      val stop = "len(list_filter(string_split(text, ' '), " +
        "t -> t IN ('the', 'a', 'of', 'and', 'in')))"
      val digits = ('0' to '9').map(sqlChar).mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
         |  CAST($sqlNTok AS BIGINT) AS n_words,
         |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars,
         |  CAST($stop AS BIGINT) AS stop_hits,
         |  CAST($digits AS BIGINT) AS n_digits,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
         |FROM documents),
         |r AS (SELECT doc_id, n_words, n_chars,
         |  CAST(n_words BETWEEN 20 AND 100000 AS INT) AS rule_word_count,
         |  CAST(3 * n_words <= n_chars AND n_chars <= 10 * n_words AS INT) AS rule_word_len,
         |  CAST(stop_hits >= 2 AS INT) AS rule_stopwords,
         |  CAST(n_digits * 5 <= n_chars AS INT) AS rule_digits,
         |  CAST(n_distinct * 5 >= n_words AS INT) AS rule_repetition
         |FROM t)
         |SELECT doc_id, n_words, n_chars AS n_alnum_chars,
         |  rule_word_count, rule_word_len, rule_stopwords, rule_digits,
         |  rule_repetition,
         |  rule_word_count * rule_word_len * rule_stopwords * rule_digits *
         |    rule_repetition AS keep
         |FROM r ORDER BY doc_id""".stripMargin
    },

    "q_embed_contamination" ->
      s"""WITH n AS (SELECT vec_id, label, embedding,
         |  sqrt(list_sum(list_transform(range(1, 65),
         |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
         |  FROM embeddings),
         |p AS (SELECT e.vec_id AS eval_id,
         |    ${sqlDot("t", "e")} / (t.nrm * e.nrm) AS sim
         |  FROM n t JOIN n e ON t.label != $EvalLabel AND e.label = $EvalLabel)
         |SELECT eval_id, count(*) AS n_near, round(max(sim), 6) AS max_sim
         |FROM p WHERE sim >= $ContamThreshold
         |GROUP BY eval_id ORDER BY eval_id""".stripMargin,

    // same x·x − 2·x·c + c·c expansion, same association order, cc from
    // a sequential list_sum — bit-identical to the Spark plan
    "q_embed_clusters" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce,
         |    list_sum(list_transform(range(1, 65),
         |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)) AS cc
         |  FROM embeddings WHERE vec_id < 8),
         |s AS (SELECT e.vec_id, c.cid,
         |    list_sum(list_transform(range(1, 65),
         |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
         |    - 2 * list_sum(list_transform(range(1, 65),
         |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE))
         |    + c.cc AS dist2
         |  FROM embeddings e CROSS JOIN c),
         |r AS (SELECT vec_id, cid, dist2,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rk
         |  FROM s)
         |SELECT vec_id, CAST(cid AS INT) AS cell, round(dist2, 6) AS dist2
         |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    // same expression SHAPE as TextAnalysis.bm25 term by term: constants
    // written as the same arithmetic ((1.2+1.0), (1.0-0.75)) so both
    // engines evaluate identical doubles; one round(,6) on the doc sum
    "q_bm25" -> {
      val terms = BmQuery.map(t => s"'$t'").mkString(", ")
      s"""WITH dl AS (SELECT doc_id, CAST($sqlNTok AS BIGINT) AS dl FROM documents),
         |st AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
         |p AS (SELECT doc_id, t.tok
         |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
         |  WHERE t.tok IN ($terms)),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM p GROUP BY doc_id, tok),
         |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |ts AS (SELECT tf.doc_id, dl.dl,
         |    ln(1.0 + (st.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
         |      (tf.tf * (1.2 + 1.0)) /
         |      (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / st.avgdl)) AS s
         |  FROM tf JOIN dfx USING (tok) JOIN dl ON tf.doc_id = dl.doc_id
         |  CROSS JOIN st)
         |SELECT doc_id, dl, round(sum(s), 6) AS score FROM ts
         |GROUP BY doc_id, dl
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    },

    "q_nb_scores" -> CurationQueries.sqlNbScores,

    // LEFT JOIN from documents + prior-argmax COALESCE mirrors
    // NaiveBayes.domainPredict's token-less-doc fallback exactly — a doc
    // with no tokens has no scored rows, and the Spark side predicts the
    // most-frequent label (ties by label asc) rather than dropping it
    "q_nb_predict" ->
      s"""WITH scored AS (${CurationQueries.sqlNbScoresBody}),
         |ranked AS (SELECT doc_id, label, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rk
         |  FROM scored),
         |prior AS (SELECT source AS plabel FROM documents
         |  GROUP BY source ORDER BY count(*) DESC, source LIMIT 1)
         |SELECT d.doc_id, COALESCE(r.label, p.plabel) AS predicted,
         |  d.source AS actual,
         |  CAST(COALESCE(r.label, p.plabel) = d.source AS INT) AS correct
         |FROM documents d
         |LEFT JOIN (SELECT doc_id, label FROM ranked WHERE rk = 1) r
         |  ON d.doc_id = r.doc_id
         |CROSS JOIN prior p
         |ORDER BY d.doc_id""".stripMargin,

    "q_pmi" ->
      """WITH toks AS (SELECT doc_id, i, ts[i] AS w
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |    LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
        |  WHERE ts[i] <> ''),
        |uni AS (SELECT w, count(*) AS cu FROM toks GROUP BY w),
        |tot AS (SELECT count(*) AS n_tok FROM toks),
        |pairs AS (
        |  SELECT ts[i] AS w1, ts[i+1] AS w2, count(*) AS cp
        |  FROM (SELECT string_split(text, ' ') AS ts FROM documents),
        |    LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
        |  WHERE ts[i] <> '' AND ts[i+1] <> ''
        |  GROUP BY 1, 2),
        |np AS (SELECT sum(cp) AS n_pair FROM pairs)
        |SELECT w1, w2, cp,
        |  round(ln((cp::DOUBLE * n_tok * n_tok) /
        |    (n_pair::DOUBLE * a.cu * b.cu)), 6) AS pmi
        |FROM pairs
        |JOIN uni a ON pairs.w1 = a.w
        |JOIN uni b ON pairs.w2 = b.w
        |CROSS JOIN tot CROSS JOIN np
        |WHERE cp >= 20
        |ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin,

    "q_epoch_shuffle" ->
      """WITH s AS (SELECT doc_id,
        |    md5('7:' || CAST(doc_id AS VARCHAR)) AS order_key
        |  FROM documents),
        |t AS (SELECT doc_id, order_key,
        |    CAST(('0x' || substr(order_key, 1, 8))::BIGINT % 16 AS INT) AS shard
        |  FROM s)
        |SELECT doc_id, shard, order_key,
        |  row_number() OVER (PARTITION BY shard ORDER BY order_key, doc_id)
        |    AS rank_in_shard
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_quality_gate" -> {
      val stop = Seq("the", "a", "of", "and", "in").map(sqlOcc).mkString(" + ")
      s"""WITH t AS (SELECT doc_id, source,
         |  CAST($sqlNTok AS BIGINT) AS n_tok,
         |  CAST($stop AS BIGINT) AS s_stop,
         |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha
         |FROM documents),
         |q AS (SELECT doc_id, source,
         |  greatest(n_tok, 1) AS nt1, least(n_tok, 64) AS ai,
         |  least(s_stop * 5, greatest(n_tok, 1)) AS bi,
         |  least(n_alpha, greatest(n_tok, 1) * 8) AS ci FROM t),
         |sc AS (SELECT doc_id, source,
         |  (32 * ai * nt1 + 1536 * bi + 192 * ci)::DOUBLE / (5120 * nt1)::DOUBLE
         |    AS quality FROM q),
         |r AS (SELECT doc_id, source, quality,
         |  row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rk,
         |  count(*) OVER (PARTITION BY source) AS n FROM sc)
         |SELECT doc_id, source, quality FROM r
         |WHERE rk * 100 <= 30 * n ORDER BY doc_id""".stripMargin
    },

    "q_embed_outliers" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce,
         |    list_sum(list_transform(range(1, 65),
         |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)) AS cc
         |  FROM embeddings WHERE vec_id < 8),
         |sc AS (SELECT e.vec_id, c.cid,
         |    list_sum(list_transform(range(1, 65),
         |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
         |    - 2 * list_sum(list_transform(range(1, 65),
         |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE))
         |    + c.cc AS dist2
         |  FROM embeddings e CROSS JOIN c),
         |a AS (SELECT vec_id, cid, round(dist2, 6) AS dist2,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rk
         |  FROM sc),
         |asg AS (SELECT vec_id, cid, dist2 FROM a WHERE rk = 1),
         |st AS (SELECT cid, count(*) AS n,
         |    sum(CAST(dist2 AS DECIMAL(18,6))) AS s,
         |    sum(CAST(dist2 AS DECIMAL(18,6)) * CAST(dist2 AS DECIMAL(18,6))) AS sxx
         |  FROM asg GROUP BY cid HAVING count(*) > 1)
         |SELECT asg.vec_id, CAST(asg.cid AS INT) AS cell, asg.dist2,
         |  round((asg.dist2 - st.s::DOUBLE / st.n) /
         |    sqrt((st.sxx::DOUBLE - st.s::DOUBLE * st.s::DOUBLE / st.n) / (st.n - 1)),
         |    6) AS z
         |FROM asg JOIN st ON asg.cid = st.cid ORDER BY vec_id""".stripMargin,

    "q_html_strip" -> {
      // the chain form the single-pass expression is contract-equal to:
      // tags -> one space; entity decode (&amp; LAST so '&'-minting
      // can't cascade); whitespace-run collapse; trim
      val wrapped = "'<p id=\"1\">' || replace(text, ' a ', ' &amp; ') || " +
        "'</p>' || chr(10) || '<br/>&nbsp;&#39;' || 'end&#39; 2 < 3'"
      s"""SELECT doc_id,
         |  trim(regexp_replace(
         |    replace(replace(replace(replace(replace(replace(
         |      regexp_replace($wrapped, '<[^>]*>', ' ', 'g'),
         |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |      '&#39;', chr(39)), '&amp;', '&'),
         |    '[ \\t\\n\\r]+', ' ', 'g')) AS clean
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_cluster_sizes" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS ce,
         |    list_sum(list_transform(range(1, 65),
         |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)) AS cc
         |  FROM embeddings WHERE vec_id < 8),
         |s AS (SELECT e.vec_id, c.cid,
         |    list_sum(list_transform(range(1, 65),
         |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
         |    - 2 * list_sum(list_transform(range(1, 65),
         |      i -> e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE))
         |    + c.cc AS dist2
         |  FROM embeddings e CROSS JOIN c),
         |r AS (SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rk
         |  FROM s)
         |SELECT CAST(cid AS INT) AS cell, count(*) AS n_vecs
         |FROM r WHERE rk = 1 GROUP BY cid ORDER BY cell""".stripMargin
  )
}

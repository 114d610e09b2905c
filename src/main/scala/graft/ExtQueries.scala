package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Round-3 coverage extensions: window-function variants (ntile /
 * percent_rank / cume_dist / first·nth·last_value), exact-sum statistical
 * aggregates, time-series gap filling, fixed-point embedding centroids,
 * CSV/JSON/ORC source+sink round trips, LATERAL top-n, correlated EXISTS,
 * and the regex scalar family. Same oracle discipline as SparkEntry:
 * DECIMAL-exact sums, one double division per score, BIGINT casts, and
 * deterministic ORDER BY.
 */
object ExtQueries {
  private val D = DecimalType(18, 2)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def fts(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Fixed staging dir per (query, sf) for the format round trips —
    * overwritten each run, so repeated Bench/Verify passes don't leak. */
  private def stage(dir: String, name: String): String = {
    val sf = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${sys.props("java.io.tmpdir")}/graft_rt_${name}_$sf"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](

    // ── Window-function variants: ntile / distribution / value pickers ──
    "q_window_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer").where(col("c_nationkey") < 5)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).cast("long").as("quartile"),
          // percent_rank/cume_dist are exact-integer ratios with one double
          // division — bit-identical across engines, no rounding needed
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("c_custkey")).over(wf).as("richest"),
          nth_value(col("c_custkey"), 2).over(wf).as("second"),
          last(col("c_custkey")).over(wf).as("poorest"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    // ── Statistical aggregates from DECIMAL-exact sums ──────────────────
    // stddev/variance/corr computed from exact decimal sums with a fixed
    // double formula (NOT the engines' streaming aggregates, whose fold
    // order makes the last ulp nondeterministic): partial aggregation of
    // decimals is exact in any order, so the derived doubles are
    // bit-identical at any parallelism — the only way these aggregates
    // hash-match on a 1000-executor cluster.
    "q_stats_agg" -> ((s, dir) => {
      val p = col("l_extendedprice").cast(D); val q = col("l_quantity").cast(D)
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(p).cast("double").as("sx"),
          sum(p * p).cast("double").as("sxx"),
          sum(q).cast("double").as("sy"),
          sum(q * q).cast("double").as("syy"),
          sum(p * q).cast("double").as("sxy"))
        .select(col("l_returnflag"), col("n"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_price"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("stddev_price"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // ── Time-series gap filling (dimension grid ⟕ sparse facts) ────────
    "q_gapfill" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      val daily = ev.where(col("value") > 180)
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      val days = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      // grid = types × days is tiny (dimension cardinality, not fact
      // cardinality) → broadcast; the only shuffle is the daily agg
      val grid = ev.select("event_type").distinct().crossJoin(broadcast(days))
      grid.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "day")
    }),

    // ── Embedding centroids via fixed-point integer sums ───────────────
    // Mean embedding per label with floor(x·1e6) BIGINT component sums:
    // float addition does not commute, so a raw float/double centroid is
    // partitioning-dependent; integer sums are exact in any order and the
    // single final division makes the result deterministic at any scale.
    // (The IVF coarse quantizer's cell means use the same construction.)
    "q_embed_centroid" -> ((s, dir) =>
      t(s, dir, "embeddings")
        // round-robin, NOT by label: 5 labels would cap parallelism at 5;
        // the (label,pos) hash agg partially combines map-side anyway
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"),
             sum(floor(col("x") * lit(1e6))).as("sum_fp"))
        .select(col("label").cast("long").as("label"),
          (col("pos") + 1).cast("long").as("pos"), col("n"),
          (col("sum_fp").cast("double") / (lit(1e6) * col("n"))).as("centroid_c"))
        .orderBy("label", "pos")),

    // ── Source/sink formats: CSV / JSON-lines / ORC round trips ────────
    // Write the table out in the format, read it back (explicit schema for
    // the text formats), aggregate — the oracle aggregates the parquet
    // ground truth directly, so any encode/decode infidelity (quoting,
    // null handling, number formatting, timestamps) breaks the hash.
    "q_csv_roundtrip" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val rt = stage(dir, "csv")
      cust.write.mode("overwrite").option("header", "true").csv(rt)
      s.read.option("header", "true").schema(cust.schema).csv(rt)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(D)).cast("double").as("bal_total"),
          min("c_name").as("first_name"),
          max("c_name").as("last_name"))
        .orderBy("c_mktsegment")
    }),

    "q_json_roundtrip" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select("event_id", "user_id", "event_type", "value", "props")
      val rt = stage(dir, "json")
      ev.write.mode("overwrite").json(rt)
      s.read.schema(ev.schema).json(rt)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D)).cast("double").as("value_total"),
          count(col("props")).as("n_props"),
          max(get_json_object(col("props"), "$.k").cast("long")).as("max_k"))
        .orderBy("event_type")
    }),

    "q_orc_roundtrip" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate")
      val rt = stage(dir, "orc")
      li.write.mode("overwrite").orc(rt)
      s.read.orc(rt)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D)).cast("double").as("qty_total"),
          fts(max(col("l_shipdate"))).as("last_ship"))
        .orderBy("l_returnflag")
    }),

    // ── LATERAL top-n per group (correlated subquery join) ─────────────
    "q_lateral_topn" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("lat_nation")
      t(s, dir, "customer").createOrReplaceTempView("lat_customer")
      s.sql("""SELECT n_name, c_custkey, c_acctbal
              |FROM lat_nation,
              |LATERAL (SELECT c_custkey, c_acctbal FROM lat_customer
              |         WHERE c_nationkey = n_nationkey
              |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
              |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
    }),

    // ── Correlated EXISTS + aggregation on top ─────────────────────────
    "q_exists_agg" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("ex_part")
      t(s, dir, "lineitem").createOrReplaceTempView("ex_lineitem")
      s.sql("""SELECT p_brand, count(*) AS n FROM ex_part
              |WHERE EXISTS (SELECT 1 FROM ex_lineitem
              |              WHERE l_partkey = p_partkey AND l_quantity > 49)
              |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    }),

    // ── Bloom runtime filter: prefiltered semi join ≡ plain semi join ──
    "q_bloom_semi" -> ((s, dir) =>
      graft.ops.RuntimeFilter.bloomSemiJoin(
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part").where(col("p_size") > 47), "p_partkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D)).cast("double").as("qty_total"))
        .orderBy("l_returnflag")),

    // ── Conversion funnel (view → click → purchase within 1 h) ─────────
    "q_funnel" -> ((s, dir) =>
      graft.ops.Funnel.counts(t(s, dir, "events"),
        steps = Seq("view", "click", "purchase"), withinSeconds = Some(3600L))),

    // ── Bigram frequency (narrow 2-shingle pairing — r19: the 2-shingle
    // IS the "w1 w2" string, so the pair rows are emitted at scan
    // locality with no (doc,pos) window exchange+sort; see
    // TextAnalysis.adjacentPairs for the equivalence argument) ─────────
    "q_bigrams" -> ((s, dir) =>
      graft.ops.TextAnalysis.adjacentPairs(
          t(s, dir, "documents"), "doc_id", "text")
        .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(40)),

    // ── Multiset set ops (ALL variants keep duplicate cardinality) ─────
    "q_intersect_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").where(col("l_partkey") < 100).select("l_partkey")
      val b = t(s, dir, "lineitem")
        .where(col("l_partkey") < 100 && col("l_quantity") > 25).select("l_partkey")
      a.intersectAll(b).orderBy("l_partkey")
    }),

    "q_except_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").where(col("l_partkey") < 100).select("l_partkey")
      val b = t(s, dir, "lineitem")
        .where(col("l_partkey") < 100 && col("l_quantity") > 25).select("l_partkey")
      a.exceptAll(b).orderBy("l_partkey")
    }),

    // ── Unpivot / melt (wide → long) ───────────────────────────────────
    "q_unpivot" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retailprice")), "attr", "val")
        .orderBy("p_partkey", "attr")),

    // ── Right outer join (fills from the build side) ───────────────────
    "q_right_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").where(col("o_totalprice") > 450000)
      bigOrders.join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_nationkey")
        .agg(count(col("o_orderkey")).as("n_big"),
          count(lit(1)).as("n_rows"))
        .orderBy("c_nationkey")
    }),

    // ── NULL semantics: derived nulls, null-safe equality, grouping ────
    "q_null_semantics" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
      val d = t(s, dir, "customer")
        .select(col("c_custkey").as("d_key"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("d_seg"))
        .where(col("d_key") % 2 === 0)
      c.join(d, col("c_custkey") === col("d_key") && col("seg") <=> col("d_seg"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          count(col("seg")).as("n_nonnull"),
          max(when(col("seg").isNull, col("c_custkey"))).as("max_null_key"))
        .orderBy(col("seg").asc_nulls_first)
    }),

    // ── Cohort retention (first-active-day cohorts × day offset) ───────
    "q_retention" -> ((s, dir) => {
      val act = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = act.groupBy("user_id").agg(min("day").as("cohort"))
      act.join(first, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("long"))
        .where(col("day_offset") <= 7)
        .groupBy(col("cohort"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort", "day_offset")
    }),

    // ── Deterministic stratified hash sampling ─────────────────────────
    "q_stratified_sample" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedHashSample(
          t(s, dir, "events"), col("event_type"), col("event_id"),
          rates = stratifiedRates, defaultRate = stratifiedDefault)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("value").cast(D)).cast("double").as("value_total"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("event_type")),

    // ── Z-order (Morton) layout key ────────────────────────────────────
    "q_zorder" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          graft.functions.ZOrderKey(col("o_custkey"), col("o_orderkey")).as("zkey"))
        .orderBy("zkey", "o_orderkey").limit(500)),

    // ── Regex scalar family ────────────────────────────────────────────
    "q_regex_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        col("p_name").rlike("red").cast("long").as("has_red"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"))
        .orderBy("p_partkey"))
  )

  /** Stratified-sample configuration shared by query and oracle. */
  private val stratifiedRates = Map("view" -> 0.5, "click" -> 0.25, "purchase" -> 1.0)
  private val stratifiedDefault = 0.05

  /** DuckDB CASE over the same exact integer thresholds the Spark side
    * uses (computed once by [[graft.ops.Sampling.threshold]]). */
  private def stratifiedThresholdSql: String =
    stratifiedRates.toSeq.sortBy(_._1).map { case (v, r) =>
      s"WHEN '$v' THEN ${graft.ops.Sampling.threshold(r)}"
    }.mkString("CASE event_type ", " ", s" ELSE ${graft.ops.Sampling.threshold(stratifiedDefault)} END")

  /** Bit-explicit Morton key — the SQL unrolling of ZOrderKey.interleave. */
  private def zorderSqlKey: String = (0 until 32).map(b =>
    s"(((o_custkey >> $b) & 1) << ${2 * b}) + (((o_orderkey >> $b) & 1) << ${2 * b + 1})")
    .mkString(" + ")

  def oracleSql: Map[String, String] = Map(
    "q_intersect_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_partkey < 100
        |INTERSECT ALL
        |SELECT l_partkey FROM lineitem WHERE l_partkey < 100 AND l_quantity > 25
        |ORDER BY l_partkey""".stripMargin,

    "q_except_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_partkey < 100
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_partkey < 100 AND l_quantity > 25
        |ORDER BY l_partkey""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size, p_retailprice AS retailprice
        |  FROM part)
        |UNPIVOT (val FOR attr IN (size, retailprice))
        |ORDER BY p_partkey, attr""".stripMargin,

    "q_right_join" ->
      """SELECT c_nationkey, count(o_orderkey) AS n_big, count(*) AS n_rows
        |FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_null_semantics" ->
      """WITH c AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer),
        |d AS (SELECT c_custkey AS d_key, nullif(c_mktsegment, 'BUILDING') AS d_seg
        |      FROM customer WHERE c_custkey % 2 = 0)
        |SELECT seg, count(*) AS n, count(seg) AS n_nonnull,
        |  max(CASE WHEN seg IS NULL THEN c_custkey END) AS max_null_key
        |FROM c JOIN d ON c_custkey = d_key AND seg IS NOT DISTINCT FROM d_seg
        |GROUP BY seg ORDER BY seg NULLS FIRST""".stripMargin,

    "q_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |firstday AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
        |  CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN firstday f ON a.user_id = f.user_id
        |WHERE date_diff('day', f.cohort, a.day) <= 7
        |GROUP BY f.cohort, date_diff('day', f.cohort, a.day)
        |ORDER BY cohort, day_offset""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT event_type, count(*) AS n_sampled,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total,
         |  min(event_id) AS min_id, max(event_id) AS max_id
         |FROM events
         |WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
         |      < $stratifiedThresholdSql
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_zorder" ->
      s"""SELECT o_orderkey, o_custkey, CAST($zorderSqlKey AS BIGINT) AS zkey
         |FROM orders ORDER BY zkey, o_orderkey LIMIT 500""".stripMargin,

    "q_window_ntile" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(c_custkey) OVER wf AS richest,
        |  nth_value(c_custkey, 2) OVER wf AS second,
        |  last_value(c_custkey) OVER wf AS poorest
        |FROM customer WHERE c_nationkey < 5
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
        |       wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,

    // DECIMAL→DOUBLE goes through VARCHAR: DuckDB's native decimal→double
    // double-rounds (int128→double, then /10^scale) and drifts a few ulp
    // from Spark's correctly-rounded BigDecimal conversion once the
    // unscaled value exceeds 2^53 (the squared-term sums here); strtod of
    // the exact decimal string is correctly rounded in both engines.
    "q_stats_agg" ->
      """WITH sums AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (sxx - sx*sx/n) / (n - 1) AS var_price,
        |  sqrt((sxx - sx*sx/n) / (n - 1)) AS stddev_price,
        |  (n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) AS corr_qty_price
        |FROM sums ORDER BY l_returnflag""".stripMargin,

    "q_gapfill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events WHERE value > 180 GROUP BY 1, 2),
        |bounds AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
        |days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT t.event_type, strftime(d.day, '%Y-%m-%d') AS day, coalesce(dy.n, 0) AS n
        |FROM types t CROSS JOIN days d
        |LEFT JOIN daily dy ON dy.event_type = t.event_type AND dy.day = d.day
        |ORDER BY t.event_type, day""".stripMargin,

    "q_embed_centroid" ->
      """SELECT CAST(label AS BIGINT) AS label, pos, count(*) AS n,
        |  CAST(sum(CAST(floor(x * 1e6) AS BIGINT)) AS DOUBLE) / (1e6 * count(*)) AS centroid_c
        |FROM (SELECT label, unnest(embedding) AS x,
        |             unnest(generate_series(1, len(embedding))) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q_csv_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  min(c_name) AS first_name, max(c_name) AS last_name
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_json_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total,
        |  count(props) AS n_props,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_total,
        |  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S.%f') AS last_ship
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_lateral_topn" ->
      """SELECT n_name, c.c_custkey, c.c_acctbal
        |FROM nation,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,

    "q_exists_agg" ->
      """SELECT p_brand, count(*) AS n FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity > 49)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_total
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 47)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_funnel" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (
        |  SELECT e.user_id, min(ts) AS t1 FROM events e JOIN s0 ON e.user_id = s0.user_id
        |  WHERE event_type = 'click' AND ts > t0 AND ts <= t0 + INTERVAL 3600 SECOND
        |  GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE event_type = 'purchase' AND ts > t1 AND ts <= t1 + INTERVAL 3600 SECOND
        |  GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 'view' AS step, CAST(0 AS BIGINT) AS stage, count(*) AS n_users FROM s0
        |  UNION ALL SELECT 'click', 1, count(*) FROM s1
        |  UNION ALL SELECT 'purchase', 2, count(*) FROM s2)
        |ORDER BY stage""".stripMargin,

    "q_bigrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |pairs AS (
        |  SELECT ts[i] || ' ' || ts[i+1] AS bigram
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
        |  WHERE ts[i] <> '' AND ts[i+1] <> '')
        |SELECT bigram, count(*) AS n FROM pairs
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 40""".stripMargin,

    "q_regex_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        |  CAST(regexp_matches(p_name, 'red') AS BIGINT) AS has_red,
        |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}

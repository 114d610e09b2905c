package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gopher rule bundle, embedding decontamination, fixed-centroid
  * assignment — the round-7 curation additions. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ── gopherReport ─────────────────────────────────────────────────────

  private val docs = Seq(
    // 20 words, clean: passes everything
    (1L, Seq.fill(4)("the quick brown fox jumps").mkString(" ")),
    // 5 words: fails word-count
    (2L, "the quick brown fox jumps"),
    // 20 words but all the same token: fails repetition (distinct*5 < 20 needs distinct<4 -> 1 ok)
    (3L, Seq.fill(20)("spam").mkString(" ")),
    // 20 words, digit-heavy: fails digit rule (all chars digits)
    (4L, Seq.fill(4)("12345 67890 11111 22222 33333").mkString(" ")),
    // 20 long words: fails mean-word-length (> 10 chars/word)
    (5L, Seq.fill(20)("incomprehensibilities").mkString(" "))
  ).toDF("doc_id", "text")

  test("gopherReport: each rule fires on its designed violator only") {
    val rows = TextAnalysis.gopherReport(docs).orderBy("doc_id").collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Int]("keep") == 1, byId(1L).toString)
    assert(byId(2L).getAs[Int]("rule_word_count") == 0 && byId(2L).getAs[Int]("keep") == 0)
    assert(byId(3L).getAs[Int]("rule_repetition") == 0 && byId(3L).getAs[Int]("keep") == 0)
    assert(byId(4L).getAs[Int]("rule_digits") == 0 && byId(4L).getAs[Int]("keep") == 0)
    assert(byId(5L).getAs[Int]("rule_word_len") == 0 && byId(5L).getAs[Int]("keep") == 0)
    // doc 3's OTHER rules still pass (rule attribution, not one blob)
    assert(byId(3L).getAs[Int]("rule_word_count") == 1)
  }

  test("gopherReport: codegen'd stopword/digit counts equal the token-filter forms") {
    // r19 pins: the doubled-space replace scan must count stopword
    // TOKENS exactly like the interpreted array filter it replaced —
    // adjacent repeats, empty tokens between them, stopwords as
    // substrings of other words, and edge padding all included — and
    // the one-pass translate() must count digit chars like the ten
    // per-digit replace scans did.
    val adversarial = Seq(
      (10L, "the the the"),                 // adjacent repeats: 3 hits
      (11L, "the  the"),                    // empty token between: 2 hits
      (12L, "theme of other lather a"),     // substrings don't count: of + a = 2
      (13L, "a"),                           // single stopword doc: 1
      (14L, ""),                            // empty doc: 0
      (15L, "in in9 9in a1b2c3 12345")      // digits mixed in tokens: 1 stop, 9 digits
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherReport(adversarial, minWords = 1)
      .orderBy("doc_id").collect()
    // independent recount with plain Scala token/char semantics
    val texts = Map(10L -> "the the the", 11L -> "the  the",
      12L -> "theme of other lather a", 13L -> "a", 14L -> "",
      15L -> "in in9 9in a1b2c3 12345")
    val stopWords = Set("the", "a", "of", "and", "in")
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val stops = t.split(" ", -1).count(stopWords.contains)
      val digits = t.count(_.isDigit)
      val expectStop = if (stops >= 2) 1 else 0
      assert(r.getAs[Int]("rule_stopwords") == expectStop,
        s"doc ${r.getAs[Long]("doc_id")}: stopword rule expected $expectStop (stops=$stops): $r")
      val nChars = t.count(_ != ' ')
      val expectDigits = if (digits * 5 <= nChars) 1 else 0
      assert(r.getAs[Int]("rule_digits") == expectDigits,
        s"doc ${r.getAs[Long]("doc_id")}: digit rule expected $expectDigits (digits=$digits): $r")
    }
  }

  test("gopherReport: integer columns only (no float in the report)") {
    val schema = TextAnalysis.gopherReport(docs).schema
    assert(schema.fields.forall(f =>
      f.dataType.typeName == "long" || f.dataType.typeName == "integer"),
      schema.treeString)
  }

  // ── bm25 ─────────────────────────────────────────────────────────────

  test("bm25 matches a hand-rolled scorer; non-matching docs absent") {
    val corpus = Seq(
      (1L, "spark joins tables fast"),
      (2L, "spark spark streaming"),
      (3L, "ducks swim in ponds"),
      (4L, "query planner of spark")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(corpus, Seq("spark", "query"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(3L)) // no query term -> absent

    // independent reimplementation with plain loops
    val docs = Map(1L -> "spark joins tables fast", 2L -> "spark spark streaming",
      3L -> "ducks swim in ponds", 4L -> "query planner of spark")
    val toks = docs.view.mapValues(_.split(" ").toSeq).toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def score(id: Long): Double = Seq("spark", "query").map { t =>
      val tf = toks(id).count(_ == t)
      if (tf == 0) 0.0
      else {
        val df = toks.values.count(_.contains(t))
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * (tf * (1.2 + 1.0)) /
          (tf + 1.2 * ((1.0 - 0.75) + 0.75 * toks(id).size / avgdl))
      }
    }.sum
    for (id <- Seq(1L, 2L, 4L)) {
      assert(got(id)._1 == toks(id).size.toLong)
      assert(math.abs(got(id)._2 - score(id)) < 1e-6, s"doc $id: ${got(id)._2} vs ${score(id)}")
    }
    // doc 4 matches both terms -> outranks single-term doc 1
    assert(got(4L)._2 > got(1L)._2)
  }

  test("bm25 plan: postings filtered before any exchange; df/stats broadcast") {
    val corpus = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = TextAnalysis.bm25(corpus, Seq("spark", "query"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the isin filter must sit below the first aggregate (prune-early)
    assert("Filter tok#\\d+ IN".r.findFirstIn(plan).isDefined, plan)
  }

  // ── embedOverlap ─────────────────────────────────────────────────────

  private def vecs(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("embedOverlap: counts train vectors over the cosine threshold per eval vector") {
    val train = vecs(
      (1L, Seq(1f, 0f, 0f)),
      (2L, Seq(0.9f, 0.1f, 0f)),  // cos vs (1,0,0) ~ 0.994
      (3L, Seq(0f, 1f, 0f)))      // orthogonal
    val eval0 = vecs(
      (100L, Seq(1f, 0f, 0f)),    // near 1 and 2
      (101L, Seq(0f, 0f, 1f)))    // near nothing
    val out = Contamination.embedOverlap(train, eval0, threshold = 0.9)
      .orderBy("eval_id").collect()
    assert(out.length == 1) // eval 101 has no match and is absent
    assert(out(0).getAs[Long]("eval_id") == 100L)
    assert(out(0).getAs[Long]("n_near") == 2L)
    assert(out(0).getAs[Double]("max_sim") == 1.0)
  }

  test("embedOverlap: plan broadcasts the eval side (no corpus shuffle)") {
    val train = vecs((1L, Seq(1f, 0f, 0f)))
    val eval0 = vecs((100L, Seq(1f, 0f, 0f)))
    val plan = Contamination.embedOverlap(train, eval0, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.toLowerCase.contains("sortmergejoin"), plan)
  }

  // ── assignCentroids ──────────────────────────────────────────────────

  test("assignCentroids: argmin of squared L2, ties to lower cell id") {
    val corpus = vecs(
      (10L, Seq(1f, 0f)),
      (11L, Seq(0f, 1f)),
      (12L, Seq(0.6f, 0.6f))) // equidistant from both centroids -> cell 0
    val cents = Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    val out = Similarity.assignCentroids(corpus, cents)
      .orderBy("vec_id").collect()
    assert(out.map(_.getAs[Int]("cell")).toSeq == Seq(0, 1, 0))
    assert(out(0).getAs[Double]("dist2") == 0.0)
    // dist2 of (0.6,0.6) to (1,0): 0.16+0.36 = 0.52 (float-exact inputs)
    assert(math.abs(out(2).getAs[Double]("dist2") - 0.52) < 1e-6)
  }

  test("assignCentroids matches a brute-force distance argmin on real data") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.where(col("vec_id") < 4).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val got = Similarity.assignCentroids(emb, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    for ((id, v) <- all) {
      val best = cents.map { case (cid, c) =>
        val d = v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, cid)
      }.min._2
      assert(got(id) == best, s"vec $id: got ${got(id)}, brute $best")
    }
  }

  test("assignCentroids: narrow plan — no exchange before the projection") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Array(0 -> Array.fill(64)(0.1), 1 -> Array.fill(64)(-0.1))
    val plan = Similarity.assignCentroids(emb, cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

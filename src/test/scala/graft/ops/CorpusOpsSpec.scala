package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 corpus operators: cross-corpus dedup admission gate,
  * intra-doc repetition removal, pattern redaction. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupAgainst drops corpus dups and within-batch dups, keeps min id") {
    val corpus = Seq((1L, "seen text"), (2L, "other text")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen text"),   // dup of corpus -> dropped
      (11L, "fresh one"),   // kept
      (12L, "fresh one"),   // within-batch dup of 11 -> dropped
      (13L, "SEEN TEXT ")   // normalized dup (trim+lower) -> dropped
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(batch, corpus).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L))
  }

  test("dedupAgainst keeps schema and is empty-corpus safe") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(batch, corpus)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("repetitionStats counts duplicate tumbling windows once") {
    // 24 tokens = 3 windows of 8; first and third identical
    val w8 = "a b c d e f g h"
    val doc = Seq((1L, s"$w8 x x x x x x x x $w8")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(doc, windowTokens = 8).collect().head
    assert(r.getAs[Long]("n_windows") == 3L)
    assert(r.getAs[Long]("n_kept") == 2L)
    assert(r.getAs[Long]("toks_total") == 24L)
    assert(r.getAs[Long]("toks_kept") == 16L)
    assert(math.abs(r.getAs[Double]("rep_ratio") - 8.0 / 24.0) < 1e-12)
  }

  test("repetitionStats: unique doc has zero repetition, partial tail window") {
    val doc = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text") // 10 toks
    val r = TextAnalysis.repetitionStats(doc, windowTokens = 8).collect().head
    assert(r.getAs[Long]("n_windows") == 2L) // 8 + 2-token tail
    assert(r.getAs[Long]("toks_total") == 10L)
    assert(r.getAs[Double]("rep_ratio") == 0.0)
  }

  test("redact masks every match and matchedChars counts them") {
    val df = Seq(("""{"a": 12, "b": 345}""")).toDF("s")
    val r = df.select(
      TextAnalysis.redact(col("s"), "[0-9]+", "#").as("scrubbed"),
      TextAnalysis.matchedChars(col("s"), "[0-9]").as("n")).collect().head
    assert(r.getAs[String]("scrubbed") == """{"a": #, "b": #}""")
    assert(r.getAs[Long]("n") == 5L)
  }

  test("bigramLogProb: common transitions outscore shuffled same-vocabulary text") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat"),
      // same vocabulary, transitions never seen elsewhere in the corpus
      (4L, "mat the on cat the sat")
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.size == 4)
    assert(Seq(1L, 2L, 3L).map(scores).min > scores(4L),
      s"shuffled doc must score lowest: $scores")
    // single-token and empty docs contribute no bigrams
    val edge = TextAnalysis.bigramLogProb(
      Seq((9L, "word"), (10L, "")).toDF("doc_id", "text"))
    assert(edge.count() == 0)
  }

  test("piiScrub tags categories in order; piiCounts counts each view") {
    val df = Seq((1L,
      "mail a.b@x.co ip 10.1.2.3 ssn 123-45-6789 acct 12345678 done"))
      .toDF("doc_id", "text")
    val out = df.select(
      (TextAnalysis.piiCounts(col("text")) :+
        TextAnalysis.piiScrub(col("text")).as("scrubbed")): _*)
      .collect().head
    assert(out.getAs[Long]("n_email") == 1L)
    assert(out.getAs[Long]("n_ipv4") == 1L)
    assert(out.getAs[Long]("n_ssn") == 1L)
    assert(out.getAs[Long]("n_longnum") == 1L) // acct only (ssn digits are hyphen-split)
    val s = out.getAs[String]("scrubbed")
    assert(s == "mail [EMAIL] ip [IPV4] ssn [SSN] acct [LONGNUM] done", s)
  }

  test("corpusChunkDedup: duplicated spans survive only at first occurrence") {
    val boiler = (1 to 4).map(i => s"boiler$i").mkString(" ") // one 4-token chunk
    val docs = Seq(
      (1L, boiler + " unique alpha beta gamma"),
      (2L, boiler + " fresh delta epsilon zeta"), // repeats doc 1's boilerplate
      (3L, boiler)                                 // nothing but the boilerplate
    ).toDF("doc_id", "text")
    val out = Dedup.corpusChunkDedup(docs, chunkTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 keeps everything (it IS the first occurrence)
    assert(out(1L) == ((2L, 2L, boiler + " unique alpha beta gamma")))
    // doc 2 loses the boilerplate chunk, keeps its unique tail
    assert(out(2L) == ((2L, 1L, "fresh delta epsilon zeta")))
    // doc 3 had only the boilerplate: it disappears entirely
    assert(!out.contains(3L), s"doc 3 must vanish: $out")
  }

  test("corpusChunkDedup md5 shuffle keys: identical to a raw-text-keyed window") {
    import org.apache.spark.sql.expressions.Window
    // a corpus with cross-doc duplicate chunks, empty chunks, and docs
    // that vanish entirely — the md5-keyed production form must match a
    // reference computed with the window partitioned on the raw text
    val docs = (1L to 40L).map { i =>
      val shared = s"common ${i % 5} span tok"
      val own = s"own$i a b c"
      (i, if (i % 7 == 0) shared else s"$shared $own")
    }.toDF("doc_id", "text")
    val got = Dedup.corpusChunkDedup(docs, chunkTokens = 4)
      .orderBy("doc_id").collect().map(_.toSeq)

    val ch = TextAnalysis.chunks(docs, chunkSize = 4, overlap = 0, "doc_id", "text")
      .where(col("chunk") =!= "")
    val w = Window.partitionBy("chunk").orderBy(col("doc_id"), col("chunk_id"))
    val kept = ch.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
    val perDoc = ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    val ref = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
            x => x.getField("chunk")), " ").as("text_dedup"))
      .join(perDoc, Seq("doc_id"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"), col("text_dedup"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq == ref.toSeq)
  }

  test("containmentVerify: embedded short doc has containment 1 from its side") {
    val short = "alpha beta gamma delta epsilon" // 3 shingles at n=3
    val long = short + " zeta eta theta iota kappa lambda mu nu xi"
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val cands = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.containmentVerify(cands, docs).collect().head
    assert(r.getDouble(2) == 1.0, s"short side fully contained: $r")
    assert(r.getDouble(3) < 0.5, s"long side only partially covered: $r")
    // symmetric jaccard on the same pair stays low — the signal
    // containment adds
    val j = Dedup.jaccardVerify(cands, docs).collect().head.getDouble(2)
    assert(j < 0.5, s"jaccard must miss the subset duplication: $j")
  }

  test("CorpusDiff.report: added/removed/changed/unchanged counted per source") {
    val cur = Seq((1L, "a", "s1"), (2L, "b", "s1"), (4L, "d", "s1"), (9L, "z", "s2"))
      .toDF("doc_id", "text", "source")
    val prev = Seq((1L, "a", "s1"), (2L, "B", "s1"), (3L, "c", "s1"), (9L, "z", "s2"))
      .toDF("doc_id", "text", "source")
    val r = CorpusDiff.report(cur, prev).collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n_added"), x.getAs[Long]("n_removed"),
          x.getAs[Long]("n_changed"), x.getAs[Long]("n_unchanged")))).toMap
    assert(r("s1") == ((1L, 1L, 1L, 1L)), s"s1: $r") // 4 added, 3 removed, 2 changed, 1 same
    assert(r("s2") == ((0L, 0L, 0L, 1L)), s"s2: $r")
  }

  test("tokenEntropy: uniform doc = log2(k) exactly, constant doc = 0") {
    val docs = Seq(
      (1L, "a b c d"),  // 4 distinct, uniform -> exactly 2 bits
      (2L, "x x x x"),  // one token -> 0 bits
      (3L, "a a b b")   // 2 distinct, uniform -> 1 bit
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(got == Map(1L -> 2.0, 2L -> 0.0, 3L -> 1.0), s"got $got")
  }

  test("tokenEntropy bounded by log2(n_distinct); empty docs drop out") {
    val docs = Seq((1L, "a a a b c"), (2L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.tokenEntropy(docs).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    val r = rows.head
    val h = r.getAs[Double]("entropy")
    val maxH = math.log(r.getAs[Long]("n_distinct").toDouble) / math.log(2)
    assert(h > 0.0 && h <= maxH + 1e-9, s"0 < $h <= $maxH")
  }

  test("topVocab breaks count ties by token; oovRate scores against the cut") {
    val docs = Seq(
      (1L, "a a a b b c"), // a=3 b=2 c=1
      (2L, "d d c b a")    // d=2 c=1 b=1 a=1  -> totals a=4 b=3 c=2 d=2
    ).toDF("doc_id", "text")
    // top-3 = a(4), b(3), then the c/d tie at 2 breaks to 'c' (token asc)
    val v = TextAnalysis.topVocab(docs, 3).select("tok").as[String].collect().toSet
    assert(v == Set("a", "b", "c"), s"got $v")
    val oov = TextAnalysis.oovRate(docs, TextAnalysis.topVocab(docs, 3))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("oov_rate")))).toMap
    assert(oov(1L) == ((6L, 0.0)), s"doc1 fully covered: $oov")
    assert(oov(2L) == ((5L, 0.4)), s"doc2 has d d OOV of 5: $oov")
  }

  test("pmiCollocations: a planted always-together pair outranks frequent-but-independent words") {
    // 'new york' always adjacent; 'the' is everywhere next to everything
    val docs = (0L until 30L).map { i =>
      (i, s"the cat new york saw the dog w$i near new york and the bird")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, minCount = 10)
      .orderBy(col("pmi").desc, col("w1"), col("w2")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // (new, york) sits at the maximum PMI (other fully-deterministic
    // word pairs in this synthetic tie with it — PMI is scale-free in
    // the pair count) with its full 2-per-doc pair count
    val ny = got.find(_._1 == (("new", "york"))).get
    assert(ny._3 == got.head._3, got.take(5).mkString(", "))
    assert(ny._2 == 60L) // 2 occurrences x 30 docs
    // pairs involving 'the' (promiscuous) rank strictly below the top
    val thePmi = got.filter(p => p._1._1 == "the" || p._1._2 == "the").map(_._3)
    assert(thePmi.nonEmpty && thePmi.forall(_ < ny._3))
  }
}

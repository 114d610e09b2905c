package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Learned BPE: hand-computed merge tables, Sennrich greedy (leftmost,
  * non-overlapping) application, deterministic tie-breaks, and the
  * double-space state invariants the engine-portable replace trick
  * relies on. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic low/lower corpus merges with exact counts") {
    // word freqs: low×5, lower×2 → pair counts over chars:
    // (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2; tie (l,o) vs (o,w) → (l,o) first
    val docs = Seq((1L, "low low low low low"), (2L, "lower lower")).toDF("doc_id", "text")
    val m = Bpe.train(docs, nMerges = 3)
    assert(m.map(x => (x.rank, x.l, x.r, x.count)) == Seq(
      (1, "l", "o", 7L),   // tie with (o,w): lexicographic left wins
      (2, "lo", "w", 7L),  // after merge 1, (lo,w)=7
      (3, "e", "r", 2L)))  // tie (low,e)=2 vs (e,r)=2 → "e" < "low"
  }

  test("application is leftmost-first non-overlapping (aaa with merge a+a)") {
    val merges = Seq(Bpe.Merge(1, "a", "a", 99L))
    val df = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    // aaa → [aa, a] = 2 tokens; aaaa → [aa, aa] = 2 tokens
    val n = df.select(Bpe.tokenCountAfter(col("text"), merges)).head().getLong(0)
    assert(n == 4L)
    // the memoized per-word counter (the registered q_bpe_tokens path
    // since r15) has identical leftmost-first non-overlapping semantics
    assert(df.select(Bpe.tokenCountFast(col("text"), merges)).head().getLong(0) == 4L)
  }

  test("memoized counter ≡ nested-replace on real corpus + edge cases") {
    val merges = Bpe.train(
      graft.Tables(spark, "/root/testdata/sf0.001", "documents"), nMerges = 12)
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val nDiff = docs.select(
        Bpe.tokenCountAfter(col("text"), merges).as("a"),
        Bpe.tokenCountFast(col("text"), merges).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(nDiff == 0, s"memoized BPE count diverges on $nDiff docs")
    // edge cases: empty text, single char, single word, chained merges
    val edge = Seq((1L, ""), (2L, "a"), (3L, "abab"), (4L, "ab ab ab"))
      .toDF("doc_id", "text")
    val chained = Seq(Bpe.Merge(1, "a", "b", 9L), Bpe.Merge(2, "ab", "ab", 9L))
    val got = edge.select(col("doc_id"),
        Bpe.tokenCountAfter(col("text"), chained).as("a"),
        Bpe.tokenCountFast(col("text"), chained).as("b"))
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.forall { case (a, b) => a == b }, got.mkString(","))
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 1L, 3L))
  }

  test("memoized counter ≡ nested-replace OUTSIDE the documents-table shape (r15 advice)") {
    // uppercase (encodeState lowercases), digits/punct (not space-wrapped
    // by the state regex, so they split [a-z] runs), repeated / leading /
    // trailing spaces (the state counts empty "words"), unicode
    val merges = Seq(Bpe.Merge(1, "a", "b", 9L), Bpe.Merge(2, "ab", "c", 9L))
    val hostile = Seq(
      (1L, "A1b"), (2L, "a1b"), (3L, "AB CD"), (4L, "ab  cd"),
      (5L, " ab"), (6L, "ab "), (7L, " "), (8L, "ABC abc"),
      (9L, "a-b_c"), (10L, "café über"), (11L, "ab3ab ab!ab"),
      (12L, "42 1337"), (13L, "ABc aBC"), (14L, "  "), (15L, "ÀBÇ"))
      .toDF("doc_id", "text")
    val rows = hostile.select(col("doc_id"),
        Bpe.tokenCountAfter(col("text"), merges).as("a"),
        Bpe.tokenCountFast(col("text"), merges).as("b"))
      .orderBy("doc_id").collect()
    for (r <- rows)
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: after=${r.getLong(1)} fast=${r.getLong(2)}")
    // spot-check the state semantics themselves: "A1b" lowers to "a1b",
    // runs "a"/"b" are 1 symbol each, digits contribute no gaps, 1 word
    assert(rows(0).getLong(1) == 1L)
  }

  test("memo past its fill-once cap stays correct and warns (r15 verdict task 5)") {
    import graft.functions.BpeCounter
    val merges = Array(("a", "b"))
    val tiny = new BpeCounter(merges, cacheCap = 4)
    val words = Seq("ab", "ba", "aab", "abab", "bbb", "abba", "baab")
    val expect = words.map(w => tiny.countWord(w)) // fills + saturates
    assert(tiny.saturated, "cap of 4 should saturate on 7 distinct words")
    // past-cap recomputes must equal the first computation (uncached path)
    val again = words.map(w => tiny.countWord(w))
    assert(again == expect)
    // and equal an uncapped counter's answers
    val big = new BpeCounter(merges)
    assert(words.map(w => big.countWord(w)) == expect)
    assert(!big.saturated)
  }

  test("merges never cross word boundaries") {
    // merge (b, c): "ab ca" must NOT merge the b|c across the space
    val merges = Seq(Bpe.Merge(1, "b", "c", 99L))
    val df = Seq((1L, "ab ca")).toDF("doc_id", "text")
    val st = df.select(Bpe.encodeState(col("text"), merges)).head().getString(0)
    assert(st == " a  b | c  a ")
    assert(df.select(Bpe.tokenCountAfter(col("text"), merges)).head().getLong(0) == 4L)
  }

  test("state invariant survives chained merges (doubles between, singles at edges)") {
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, nMerges = 2)
    // (a,b)=4 → ab; then (ab,ab)=2 → abab
    assert(m.map(x => (x.l, x.r, x.count)) == Seq(("a", "b", 4L), ("ab", "ab", 2L)))
    val st = docs.select(Bpe.encodeState(col("text"), m)).head().getString(0)
    assert(st == " abab | abab ")
    assert(docs.select(Bpe.tokenCountAfter(col("text"), m)).head().getLong(0) == 2L)
  }

  test("driver-local merge loop ≡ distributed merge loop (classic, testdata, seeded random)") {
    def both(docs: org.apache.spark.sql.DataFrame, n: Int): Unit = {
      val vocab = Bpe.vocabOf(docs, "text")
      val local = Bpe.trainLocal(
        vocab.collect().map(r => (r.getLong(0), r.getString(1))).toSeq, n)
      val dist = Bpe.trainDistributed(vocab, n)
      assert(local == dist)
      assert(local.nonEmpty)
    }
    both(Seq((1L, "low low low low low"), (2L, "lower lower")).toDF("doc_id", "text"), 6)
    both(graft.Tables(spark, "/root/testdata/sf0.001", "documents"), 12)
    // seeded random corpus: short alphabet forces heavy pair-count ties,
    // exercising the (cnt desc, l asc, r asc) tie-break in both loops
    val rnd = new scala.util.Random(42)
    val docs = (1L to 60L).map { i =>
      (i, Seq.fill(rnd.nextInt(8) + 2)(
        Seq.fill(rnd.nextInt(6) + 1)("abc" (rnd.nextInt(3))).mkString).mkString(" "))
    }.toDF("doc_id", "text")
    both(docs, 8)
  }

  test("incremental local loop ≡ distributed on a synthetic vocab, deep merge run") {
    // exercises the incremental pair-count bookkeeping (stale index
    // skips, zero-count removal, within-word repeated pairs) through a
    // merge run deep enough that most words are touched repeatedly —
    // the regime the naive rescan never stressed
    val rnd = new scala.util.Random(7)
    val vocabRows = (1 to 400).map { _ =>
      val w = (1 to rnd.nextInt(9) + 2).map(_ => "abcd" (rnd.nextInt(4))).mkString
      (rnd.nextInt(50) + 1L, " " + w.toCharArray.mkString("  ") + " ")
    }.distinct
    val local = Bpe.trainLocal(vocabRows, nMerges = 40)
    val dist = Bpe.trainDistributed(
      vocabRows.toDF("freq", "state").localCheckpoint(), nMerges = 40)
    assert(local == dist)
    assert(local.size == 40)
  }

  test("train matches its own generated oracle semantics on the driver tables") {
    // sf0.001 documents: counts must be exact, ranks strictly ordered,
    // chosen pair counts non-increasing (classic BPE monotonicity),
    // merged symbols concatenations of their parts
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val m = Bpe.train(docs, nMerges = 10)
    assert(m.size == 10)
    assert(m.map(_.rank) == (1 to 10))
    assert(m.sliding(2).forall { case Seq(a, b) => a.count >= b.count; case _ => true })
    // recompute rank-1 independently: argmax over initial char pairs
    val pairs = docs.select(explode(Bpe.words(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("f"), split(trim(Bpe.initState(col("w"))), "  ").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("f"), explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("l"),
                    element_at(col("t"), i + 2).as("r")))).as("p"))
      .groupBy("p.l", "p.r").agg(sum("f").as("cnt"))
      .orderBy(desc("cnt"), asc("l"), asc("r")).head()
    assert((m.head.l, m.head.r, m.head.count) ==
      (pairs.getString(0), pairs.getString(1), pairs.getLong(2)))
    // applying all merges strictly compresses vs chars and never below words
    val r = docs.select(
      sum(Bpe.tokenCountAfter(col("text"), m)).as("bpe"),
      sum(length(replace(col("text"), lit(" "), lit("")))).as("chars"),
      sum(TextAnalysis.tokenCount(col("text"))).as("words")).head()
    assert(r.getLong(0) < r.getLong(1) && r.getLong(0) >= r.getLong(2))
  }
}

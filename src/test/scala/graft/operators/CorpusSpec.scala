package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  test("chunk: window/stride arithmetic on a synthetic doc, tail kept") {
    import spark.implicits._
    // 150 tokens, window 64, stride 48 → starts 0/48/96/144 →
    // lengths 64, 64, 54, 6
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, text), (2L, "single"), (3L, " ")).toDF("doc_id", "text")
    val ch = Corpus.chunk(d).orderBy("doc_id", "chunk_id").collect()
    val one = ch.filter(_.getLong(0) == 1L).map(r => (r.getLong(1), r.getLong(2)))
    assert(one.toSeq == Seq((0L, 64L), (1L, 64L), (2L, 54L), (3L, 6L)))
    // a one-token doc is one one-token chunk; a blank doc emits nothing
    assert(ch.filter(_.getLong(0) == 2L).map(r => (r.getLong(1), r.getLong(2)))
      .toSeq == Seq((0L, 1L)))
    assert(!ch.exists(_.getLong(0) == 3L))
  }

  test("chunk: full corpus coverage — per-chunk length and count identities") {
    // chunk i holds exactly min(window, n − i·stride) tokens, and there
    // are floor((n−1)/stride)+1 chunks — together: every token position is
    // covered and the tail is never dropped
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.select(col("doc_id"),
      size(filter(split(trim(col("text")), "\\s+"),
        t => length(t) > 0)).cast("bigint").as("n"))
    val ch = Corpus.chunk(docs).join(n, "doc_id")
    assert(ch.filter(col("n_tokens") =!=
      least(lit(64L), col("n") - col("chunk_id") * 48)).count() == 0)
    val counts = ch.groupBy("doc_id").agg(count(lit(1)).as("c"))
      .join(n, "doc_id")
      .filter(col("c") =!= floor((col("n") - 1) / 48) + 1)
    assert(counts.count() == 0)
  }

  test("chunk: fingerprints are chunk-content hashes (equal chunks collide)") {
    import spark.implicits._
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = Corpus.chunk(d).select("doc_id", "chunk_fp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
  }

  test("repeatedSpans: cross-doc span, self-repetition, clean doc, blank doc") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, s"$span iota kappa"),          // 10 tokens: window 0 = the span
      (2L, s"X $span Y"),                 // 10 tokens: window 1 = the span
      (3L, "totally different words one two three four five six seven"),
      (4L, s"$span $span"),               // 16 tokens: windows 0 and 8 equal
      (5L, "")                            // no windows at all
    ).toDF("doc_id", "text")
    val out = Corpus.repeatedSpans(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 1L, 0.333333)))
    assert(out(2L) == ((3L, 1L, 0.333333)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    // doc 4's windows 0 and 8 are both the span (duplicated in docs 1/2
    // AND in itself); windows 1–7 are unique rotations
    assert(out(4L) == ((9L, 2L, 0.222222)))
    assert(out(5L) == ((0L, 0L, 0.0)))
    // one row per document, including span-free and empty ones
    assert(out.size == 5)
    val plan = Corpus.repeatedSpans(d).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("longestDupSpan: consecutive dup windows convert to span length") {
    import spark.implicits._
    // docs 1/2 share an exact 10-token span: 3 consecutive duplicated
    // 8-token windows -> run 3 -> longest span 3 + 7 = 10 tokens
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val d = Seq(
      (1L, s"a1 a2 a3 $shared b1 b2"),   // 15 tokens, dup runs at pos 3..5
      (2L, s"c1 c2 c3 c4 c5 $shared"),   // 15 tokens, dup runs at pos 5..7
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")  // clean
    ).toDF("doc_id", "text")
    val out = Corpus.longestDupSpan(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((8L, 3L, 10L)))
    assert(out(2L) == ((8L, 3L, 10L)))
    assert(out(3L) == ((5L, 0L, 0L)))
  }

  test("longestDupSpan: two separated runs report the longer one") {
    import spark.implicits._
    // doc 1 repeats an 8-token block (run 1, span 8) and a 9-token block
    // (run 2, span 9) with unique separators; max must be 9
    val b8 = "p1 p2 p3 p4 p5 p6 p7 p8"
    val b9 = "q1 q2 q3 q4 q5 q6 q7 q8 q9"
    val d = Seq(
      (1L, s"$b8 x1 x2 $b9"),
      (2L, s"y1 $b8 y2 y3 $b9 y4")
    ).toDF("doc_id", "text")
    val out = Corpus.longestDupSpan(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 9L)))
    assert(out(2L) == ((2L, 9L)))
  }

  test("removeRepeatedSpans: masks covered tokens, merges overlaps, keeps clean docs") {
    import spark.implicits._
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, s"$span iota kappa"),          // windows 0 dup → tokens 1-8 removed
      (2L, s"X $span Y"),                 // window 1 dup → tokens 2-9 removed
      (3L, "totally different words one two three four five six seven"),
      (4L, s"$span $span"),               // windows 0 and 8 dup → ALL 16 covered
      (5L, "")                            // nothing to do
    ).toDF("doc_id", "text")
    val out = Corpus.removeRepeatedSpans(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out(1L) == ((10L, 8L, 1L, "iota kappa")))
    assert(out(2L) == ((10L, 8L, 1L, "X Y")))
    assert(out(3L) == ((10L, 0L, 0L,
      "totally different words one two three four five six seven")))
    // doc 4: windows 0 (tokens 1-8) and 8 (tokens 9-16) overlap-adjacent →
    // ONE merged span covering everything, empty cleaned text
    assert(out(4L) == ((16L, 16L, 1L, "")))
    assert(out(5L) == ((0L, 0L, 0L, "")))
    assert(out.size == 5)
    val plan = Corpus.removeRepeatedSpans(d).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("removeRepeatedSpans: disjoint dup spans in one doc count separately") {
    import spark.implicits._
    val a = "a1 a2 a3 a4 a5 a6 a7 a8"
    val b = "b1 b2 b3 b4 b5 b6 b7 b8"
    val d = Seq(
      // spanA + 3 unique separators + spanB: two disjoint removed spans
      (1L, s"$a mid1 mid2 mid3 $b"),
      (2L, s"left $a right"),
      (3L, s"up $b down")
    ).toDF("doc_id", "text")
    val out = Corpus.removeRepeatedSpans(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out(1L) == ((19L, 16L, 2L, "mid1 mid2 mid3")))
    assert(out(2L) == ((10L, 8L, 1L, "left right")))
    assert(out(3L) == ((10L, 8L, 1L, "up down")))
  }

  test("removeRepeatedSpans: minSpanTokens masks only maximal runs at least that long") {
    import spark.implicits._
    val short = "s1 s2 s3 s4 s5 s6 s7 s8"                        // 8-token dup span
    val long16 = "l1 l2 l3 l4 l5 l6 l7 l8 l9 l10 l11 l12 l13 l14 l15 l16"
    val d = Seq(
      // doc 1 carries BOTH: the 8-token run survives the L=16 threshold,
      // the 16-token run is cut
      (1L, s"$short m1 m2 m3 $long16"),
      (2L, s"pre $short post"),
      (3L, s"head $long16 tail")
    ).toDF("doc_id", "text")
    val out = Corpus.removeRepeatedSpans(d, minSpanTokens = 16).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out(1L) == ((27L, 16L, 1L, s"$short m1 m2 m3")))
    assert(out(2L) == ((10L, 0L, 0L, s"pre $short post")))
    assert(out(3L) == ((18L, 16L, 1L, "head tail")))
    // threshold at/below the window size masks everything, like default
    val dflt = Corpus.removeRepeatedSpans(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val atN = Corpus.removeRepeatedSpans(d, minSpanTokens = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dflt == atN)
    assert(dflt(1L) == 24L && dflt(2L) == 8L)
  }

  test("tokenBudgetMix: quality-ranked greedy fill per source, budget respected") {
    import spark.implicits._
    // quality = 0.5*min(1, n/100) + 0.5*min(1, 5*stopRatio); "the" is an
    // English stopword, so docs with more "the" rank higher at equal length
    val d = Seq(
      (1L, "the the the the aaaa bbbb cccc dddd", "s1"), // high quality
      (2L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh", "s1"), // low quality
      (3L, "the the aaaa bbbb cccc dddd eeee ffff", "s1"), // middle
      (4L, "the the the the the the the the", "s2")
    ).toDF("doc_id", "text", "source")
    // doc1: 35 chars -> 9 est tokens; doc3: 37 -> 10; doc2: 39 -> 10;
    // budget 20 fits docs 1+3 (9+10=19), doc2 would overflow (29)
    val out = Corpus.tokenBudgetMix(d, budget = 20).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.keySet == Set(1L, 3L, 4L))
    assert(out(1L) == (("s1", 9L, 9L)))
    assert(out(3L) == (("s1", 10L, 19L))) // cumulative fills toward the budget
    assert(out(4L)._1 == "s2") // budgets are per source, not global
  }

  test("sourceOverlap: jaccard identities on constructed source pairs") {
    import spark.implicits._
    val d = Seq(
      (1L, "w1 w2 w3 w4", "sA"),            // shingles: {w1 w2 w3, w2 w3 w4}
      (2L, "w1 w2 w3", "sB"),               // {w1 w2 w3} — contained in sA
      (3L, "x1 x2 x3 x4", "sC")             // disjoint from both
    ).toDF("doc_id", "text", "source")
    val out = Corpus.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // only the overlapping pair appears; containment: inter=1, union=2
    assert(out.keySet == Set(("sA", "sB")))
    assert(out(("sA", "sB")) == ((2L, 1L, 1L, 0.5)))
  }

  test("sourceOverlapMinhash: equals the exact matrix filtered at the threshold") {
    // real-corpus fixture: 20 sources, true pair jaccard 0.013-0.06 at this
    // SF — exactly the low-similarity regime the r=1 banding is sized for
    val docs = graft.Tables.load(spark, sf, "documents")
    val exact = Corpus.sourceOverlap(docs)
      .filter(col("jaccard") >= 0.05)
    val banded = Corpus.sourceOverlapMinhash(docs)
    assert(banded.count() > 0, "fixture should have pairs at jaccard >= 0.05")
    assert(banded.exceptAll(exact).isEmpty && exact.exceptAll(banded).isEmpty,
      "banded+verified pairs must equal the exact matrix at the threshold (recall 1.0)")
    // constructed containment pair from the exact test survives the scale path
    import spark.implicits._
    val d = Seq(
      (1L, "w1 w2 w3 w4", "sA"),
      (2L, "w1 w2 w3", "sB"),
      (3L, "x1 x2 x3 x4", "sC")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.sourceOverlapMinhash(d, threshold = 0.5).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out.keySet == Set(("sA", "sB")))
    assert(out(("sA", "sB")) == ((2L, 1L, 1L, 0.5)))
  }

  private val cdcBase = (1 to 60).map(i => s"word$i token$i item$i").mkString(" ")

  test("contentDefinedChunks: chunks partition each document exactly") {
    import spark.implicits._
    val d = Seq((1L, cdcBase), (2L, "tiny"), (3L, "")).toDF("doc_id", "text")
    val rows = Corpus.contentDefinedChunks(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // empty doc filtered; short doc = one whole-text chunk
    assert(rows.filter(_._1 == 3L).isEmpty)
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L, 4L)))
    val c1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(c1.length > 1, "base text should produce multiple chunks")
    assert(c1.head._3 == 1L)
    // contiguous: each start = previous start + previous len; total = len
    c1.sliding(2).foreach { case Array(a, b) => assert(b._3 == a._3 + a._4) }
    assert(c1.map(_._4).sum == cdcBase.length)
  }

  test("contentDefinedChunks: identical content marks one first occurrence") {
    import spark.implicits._
    val d = Seq((1L, cdcBase), (2L, cdcBase)).toDF("doc_id", "text")
    val rows = Corpus.contentDefinedChunks(d).collect()
      .map(r => (r.getLong(0), r.getBoolean(4)))
    // every doc-2 chunk has an identical doc-1 twin, so none is a first
    // occurrence (doc 1 may ALSO carry internal dups — tiny chunks like
    // "ite" can repeat inside one doc; real CDC stores add a min-chunk
    // size for that, which this simple variant deliberately omits)
    assert(rows.filter(_._1 == 2L).forall(!_._2), "doc 2 chunks are all dups")
    assert(rows.filter(_._1 == 1L).exists(_._2), "doc 1 has first occurrences")
  }

  test("contentDefinedChunks: boundaries re-sync after a prefix insertion") {
    import spark.implicits._
    // the CDC property fixed-stride chunking lacks: a prefix shifts every
    // char position, yet once past the first content boundary the chunks
    // realign, so most of the shifted copy still dedups against the
    // original
    val d = Seq((1L, cdcBase), (2L, "INSERTED PREFIX " + cdcBase))
      .toDF("doc_id", "text")
    val doc2 = Corpus.contentDefinedChunks(d).collect()
      .filter(_.getLong(0) == 2L).map(_.getBoolean(4))
    assert(doc2.count(_ == false) >= doc2.length / 2,
      s"expected most shifted chunks to dedup, got ${doc2.toSeq}")
  }

  test("clusterAtomicSplit: no component ever spans two splits") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val assigned = Corpus.clusterAtomicSplit(docs, Dedup.minhashLsh(docs, 0.5))
    val cross = assigned.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") >= 2).count()
    assert(cross == 0L, s"$cross components cross a split boundary")
  }

  test("clusterAtomicSplit: singletons keep the naive id-hash assignment") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val assigned = Corpus.clusterAtomicSplit(docs, Dedup.minhashLsh(docs, 0.5))
    val naive = Corpus.datasetSplit(docs)
      .select(col("doc_id"), col("split").as("naive_split"))
    val moved = assigned.filter(col("rep") === col("doc_id"))
      .join(naive, "doc_id")
      .filter(col("split") =!= col("naive_split")).count()
    assert(moved == 0L, "a self-representative doc must never move")
  }

  test("clusterAtomicSplit: a planted cross-split pair moves as a unit") {
    import spark.implicits._
    // ids 7 (train under %10) and 8 (val) share a text: the naive split
    // leaks them across the boundary; the atomic split keys both on rep=7
    val t = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    val docs = Seq((7L, t), (8L, t), (11L, "q1 q2 q3 q4 q5 q6 q7 q8"))
      .toDF("doc_id", "text")
    val rows = Corpus.clusterAtomicSplit(docs, Dedup.minhashLsh(docs, 0.5))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows(7L) == (7L, "train") && rows(8L) == (7L, "train"),
      s"pair must land together in rep 7's split: $rows")
    assert(rows(11L) == (11L, "train"), "singleton keeps its own id hash")
  }
}

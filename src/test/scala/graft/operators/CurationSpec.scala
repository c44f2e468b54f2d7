package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 curation additions: Gopher rule-set gate, BPE pair counting,
  * temperature mixture weights, DSIR importance weights.
  */
class CurationSpec extends SparkSpec {

  private def doc(id: Long, text: String) = (id, text)

  test("gopherRules: each rule trips on its own pathology") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => if (i % 7 == 0) "the" else "word").mkString(" ")
    val docs = Seq(
      doc(1L, fifty + " of and"),                       // passes everything
      doc(2L, "the of and with that"),                  // too short
      doc(3L, (1 to 60).map(_ => "pneumonoultramicroscopic").mkString(" ")
        + " the of"),                                   // mean word len > 10
      doc(4L, fifty + " of " + ("### " * 20).trim),     // symbol ratio > 0.1
      doc(5L, (1 to 60).map(_ => "123").mkString(" ")), // alpha frac < 0.8, no stopwords
      doc(6L, (1 to 30).map(_ => "- bullet item the of\n").mkString),  // bullets
      doc(7L, (1 to 30).map(_ => "trailing the of line...\n").mkString) // ellipsis
    ).toDF("doc_id", "text")
    val out = TextProfile.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(13), "doc 1 should pass all rules")
    assert(!out(2L).getBoolean(6) && !out(2L).getBoolean(13))  // ok_words
    assert(!out(3L).getBoolean(7))                             // ok_mean_len
    assert(!out(4L).getBoolean(8))                             // ok_symbols
    assert(!out(5L).getBoolean(9) && !out(5L).getBoolean(10))  // ok_alpha, ok_stop
    assert(!out(6L).getBoolean(11))                            // ok_bullets
    assert(!out(7L).getBoolean(12))                            // ok_ellipsis
  }

  test("gopherRules is scan-local: no exchange in the plan") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val plan = TextProfile.gopherRules(docs).queryExecution.executedPlan.toString
    // the only allowed exchange is the final presentation sort's
    assert(!plan.split("\n").exists(l =>
      l.contains("Exchange hashpartitioning")), s"unexpected shuffle:\n$plan")
  }

  test("pairCounts: closed-form counts, overlapping pairs, pre-token locality") {
    import spark.implicits._
    // vocab: "aaab" freq 2 ("aa" twice per occurrence, "ab" once),
    // "cd" freq 1, "x" too short, "a1" split by pre-tokenizer (no pair)
    val docs = Seq(doc(1L, "aaab cd x a1"), doc(2L, "aaab")).toDF("doc_id", "text")
    val got = Bpe.pairCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("aa" -> 4L, "ab" -> 2L, "cd" -> 1L))
  }

  test("trainMerges: merged symbols feed later merges; ties break (lhs, rhs)") {
    import spark.implicits._
    // "abc" x4: (a,b) and (b,c) tie at 4 -> lhs order picks (a,b); the
    // second merge then pairs the NEW symbol "ab" with "c" — the loop is
    // real, not four independent first merges
    val docs = Seq(doc(1L, "abc abc"), doc(2L, "abc abc")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, nMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "b", 4L), (2, "ab", "c", 4L)))
  }

  test("trainMerges: greedy left-to-right, non-overlapping (aaa -> [aa, a])") {
    import spark.implicits._
    // "aaa": (a,a) at two positions but only ONE merge applies (greedy,
    // non-overlapping); "aaaa" -> [aa, aa]. Post-merge pair counts:
    // (aa,a)=1 vs (aa,aa)=1 — rhs tie-break picks (aa, a)
    val docs = Seq(doc(1L, "aaa aaaa")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, nMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "a", 5L), (2, "aa", "a", 1L)))
  }

  test("trainMerges: 16 merges with and without lineage checkpoints agree") {
    import spark.implicits._
    // enough pair diversity for 16 distinct merges; checkpointEvery=4
    // truncates the replace chain 3 times mid-loop — the merge table must
    // be identical to the untruncated run (checkpointing is physical only)
    val docs = Seq(
      doc(1L, "abcdefgh abcdefgh abcdefgh intersect"),
      doc(2L, "abcd efgh ijklmnop ijklmnop qrstuv"),
      doc(3L, "mnopqrst mnopqrst uvwxyz uvwxyz wx")
    ).toDF("doc_id", "text")
    val bounded = Bpe.trainMerges(docs, nMerges = 16, checkpointEvery = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val unbounded = Bpe.trainMerges(docs, nMerges = 16, checkpointEvery = 0).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(bounded.length == 16)
    assert(bounded.toSeq == unbounded.toSeq,
      "lineage checkpoints must not change the trained merge table")
  }

  test("encodeTokenCounts: hand-checked counts under a trained merge table") {
    import spark.implicits._
    // corpus: "abab ab cd" x2 → merges: (a,b) count 6, then (ab,ab) count 2
    val docs = Seq(doc(1L, "abab ab cd"), doc(2L, "abab ab cd"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, nMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    val out = Bpe.encodeTokenCounts(docs, merges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // per doc: pre-tokens [abab, ab, cd] → tokens [abab]=1, [ab]=1, [c,d]=2
    // chars 4+2+2 = 8, tokens 4 → 2.0 chars/token
    assert(out(1L) == ((3L, 4L, 8L, 2.0)))
    assert(out(2L) == ((3L, 4L, 8L, 2.0)))
    // empty merge table = character tokenizer: 8 chars → 8 tokens
    val raw = Bpe.encodeTokenCounts(docs, Nil).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(1L) == 8L)
    // chunked merge application (lineage bound) is semantics-neutral
    val chunked = Bpe.encodeTokenCounts(docs, merges, checkpointEvery = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val unchunked = Bpe.encodeTokenCounts(docs, merges, checkpointEvery = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chunked == unchunked)
  }

  test("encodeTokenCounts: empty and whitespace-only docs emit zero rows, not nulls") {
    import spark.implicits._
    val docs = Seq(doc(1L, "ab ab"), doc(2L, ""), doc(3L, "   ")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val out = Bpe.encodeTokenCounts(docs, merges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out.size == 3)
    assert(out(1L) == ((2L, 2L, 4L, 2.0)))
    assert(out(2L) == ((0L, 0L, 0L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0L, 0.0)))
  }

  test("trainMerges: first merge agrees with pairCounts' top-1 ranking") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val first = Bpe.trainMerges(docs, nMerges = 1).collect()(0)
    val top = Bpe.pairCounts(docs, topK = 1).collect()(0)
    assert(first.getString(1) + first.getString(2) == top.getString(0))
    assert(first.getLong(3) == top.getLong(1))
  }

  test("temperatureMix: alpha<1 up-weights small sources; weights sum to 1") {
    import spark.implicits._
    val docs = (Seq.fill(9)(("big", "a" * 400)) ++ Seq(("small", "a" * 400)))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val rows = Corpus.temperatureMix(docs, alpha = 0.3, srcCol = "source")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val (pBig, wBig, boostBig) = rows("big")
    val (pSmall, wSmall, boostSmall) = rows("small")
    assert(math.abs(pBig - 0.9) < 1e-6 && math.abs(pSmall - 0.1) < 1e-6)
    assert(boostSmall > 1.0 && boostBig < 1.0)
    assert(math.abs(wBig + wSmall - 1.0) < 1e-5)
    // alpha=1 recovers proportional sampling
    val prop = Corpus.temperatureMix(docs, alpha = 1.0).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(prop("big") - 0.9) < 1e-5)
  }

  test("dsirWeights: target-like docs score above pool-like docs") {
    import spark.implicits._
    val target = (1L to 10L).map(i => (i, true, "alpha beta gamma delta"))
    val pool = (11L to 20L).map(i => (i, false, "omega sigma tau rho"))
    val probeT = Seq((100L, false, "alpha beta gamma delta"))
    val probeP = Seq((101L, false, "omega sigma tau rho"))
    val docs = (target ++ pool ++ probeT ++ probeP)
      .toDF("doc_id", "is_t", "text")
    val out = Importance.dsirWeights(docs, col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // absolute sign is smoothing-dominated on a tiny corpus (add-1 over
    // 8192 buckets); DSIR resampling only consumes the ORDERING
    assert(out(100L) > out(101L),
      s"target-like ${out(100L)} should beat pool-like ${out(101L)}")
    // n_tokens is the doc's token count
    val n = Importance.dsirWeights(docs, col("is_t"))
      .filter(col("doc_id") === 100L).select("n_tokens").head().getLong(0)
    assert(n == 4L)
  }
}

package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LateInteractionSpec extends SparkSpec {

  private lazy val tok =
    LateInteraction.tokenView(Tables.load(spark, sf, "embeddings"))
  private lazy val queries = tok.filter(col("doc") < 3)

  private def bitEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("MaxSim dominates any single token pair and a planted near-dup doc wins") {
    import spark.implicits._
    // hand fixture: doc 0 = query (2 tokens), doc 1 = exact copy of the
    // query's tokens, doc 2 = one matching token + one orthogonal
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)), (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(1f, 0f, 0f, 0f)), (5L, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val t = LateInteraction.tokenView(rows, tokensPerDoc = 2)
    val got = LateInteraction.maxSimBrute(t, t.filter(col("doc") === 0))
      .orderBy(col("rank")).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L),
      "the exact multi-vector copy must outrank the half-match")
    assert(got(0).getDouble(3) == 2.0, "two perfect per-token maxes sum to 2")
    assert(got(1).getDouble(3) == 1.0,
      "one perfect max + one orthogonal (0) sums to 1")
  }

  test("probing every doc degenerates the pruned path to brute, bit-equal") {
    val nDocs = tok.select("doc").distinct().count().toInt
    assert(bitEqual(
      LateInteraction.maxSimPruned(tok, queries, cPerToken = nDocs * 8),
      LateInteraction.maxSimBrute(tok, queries)),
      "cPerToken >= every token must reproduce the exact ranking")
  }

  test("pruned re-rank is exact: shared (query, doc) rows carry identical scores") {
    val brute = LateInteraction.maxSimBrute(tok, queries)
      .select("qdoc", "cdoc", "score")
    val pruned = LateInteraction.maxSimPruned(tok, queries)
      .select("qdoc", "cdoc", "score")
    // every pruned result that brute also ranked must agree bit-for-bit:
    // pruning may LOSE a candidate, never mis-score one
    assert(pruned.join(brute, Seq("qdoc", "cdoc"), "left_semi")
      .exceptAll(brute.join(pruned, Seq("qdoc", "cdoc"), "left_semi"))
      .isEmpty,
      "a doc ranked by both paths must have the same exact MaxSim score")
    assert(pruned.count() > 0)
  }

  test("rerank under an all-pairs nomination equals brute (external-nominator contract)") {
    val cand = queries.select(col("doc").as("qdoc")).distinct()
      .crossJoin(tok.select(col("doc").as("cdoc")).distinct())
      .filter(col("qdoc") =!= col("cdoc"))
    assert(bitEqual(
      LateInteraction.rerank(tok, queries, cand),
      LateInteraction.maxSimBrute(tok, queries)),
      "a nominate-everything external stage must reproduce the exact ranking")
  }

  test("MaxSim plans never shuffle the token table through a join: all joins broadcast") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // brute, pruned, and an external-nominator rerank: the corpus-sized
      // token scan must only ever meet broadcast sides — a sort-merge
      // join would re-sort/shuffle the whole token table per serve
      val cand = queries.select(col("doc").as("qdoc")).distinct()
        .crossJoin(tok.select(col("doc").as("cdoc")).distinct().limit(5))
        .filter(col("qdoc") =!= col("cdoc"))
      Seq(
        LateInteraction.maxSimBrute(tok, queries),
        LateInteraction.maxSimPruned(tok, queries),
        LateInteraction.rerank(tok, queries, cand)).foreach { df =>
        val smj = df.queryExecution.executedPlan
          .collect { case s: SortMergeJoinExec => s }
        assert(smj.isEmpty,
          s"expected broadcast-only joins, found sort-merge:\n${
            df.queryExecution.executedPlan}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("a query's own document never appears among its candidates") {
    val got = LateInteraction.maxSimBrute(tok, queries)
    assert(got.filter(col("qdoc") === col("cdoc")).isEmpty)
    val pr = LateInteraction.maxSimPruned(tok, queries)
    assert(pr.filter(col("qdoc") === col("cdoc")).isEmpty)
  }

  test("reconstructed (PLAID) re-rank: broadcast-only joins, nomination restriction and own-doc exclusion hold") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val emb = Tables.load(spark, sf, "embeddings")
    val grid = SQ.stats(emb)
    val recon = SQ.reconstruct(SQ.encode(emb, grid), grid)
    val cand = queries.select(col("doc").as("qdoc")).distinct()
      .crossJoin(tok.select(col("doc").as("cdoc")).distinct()
        .orderBy(col("cdoc")).limit(5))
      .filter(col("qdoc") =!= col("cdoc"))
      .localCheckpoint()
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val got = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = LateInteraction.rerankReconstructed(recon, queries, cand)
      // the corpus-sized code/reconstruction scan must only ever meet
      // broadcast sides — the float rerank's contract, compressed edition
      val smj = df.queryExecution.executedPlan
        .collect { case s: SortMergeJoinExec => s }
      assert(smj.isEmpty,
        s"expected broadcast-only joins, found sort-merge:\n${
          df.queryExecution.executedPlan}")
      df.localCheckpoint()
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    // nomination restriction: every output (qdoc, cdoc) was nominated
    assert(got.join(cand, Seq("qdoc", "cdoc"), "left_anti").isEmpty,
      "a doc nominated for one query must not enter another's re-rank")
    assert(got.filter(col("qdoc") === col("cdoc")).isEmpty)
    // scores are per-token-max sums of round-6 cosines: |score| <= 8
    assert(got.filter(abs(col("score")) > 8.000001).isEmpty)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LATE-INTERACTION (multi-vector) retrieval — MaxSim scoring over
  * per-token embeddings (Khattab & Zaharia, "ColBERT: Efficient and
  * Effective Passage Search via Contextualized Late Interaction over
  * BERT", SIGIR'20): a document is a BAG of token vectors, and
  * score(q, d) = Σ_{i ∈ q} max_{j ∈ d} cos(q_i, d_j) — every query token
  * independently finds its best-matching document token, and the doc is
  * ranked by the sum. The architecture the single-vector families
  * (PQ/IVF/SQ8/matryoshka) cannot express: a doc relevant to ONE query
  * facet per token wins over a doc mediocre at all of them, which a
  * pooled single vector averages away.
  *
  * Determinism contract (the repo's ANN convention): cosines round to 6;
  * the per-query-token max is over rounded values; the MaxSim sum is a
  * DECIMAL(18,6) sum of those maxes cast to double at the end (the q74
  * decimal-sum shape); rankings order by (score DESC, doc) — total, so
  * every LIMIT is replayable by the DuckDB oracle.
  *
  * Scale shape: queries are a bounded set (broadcast — |Q| token
  * vectors, not corpus-sized). [[maxSimBrute]] is one scan of the token
  * table with two map-side-combined aggregates on top (the exact audit
  * baseline, the q30 role). [[maxSimPruned]] is the production serving
  * shape: a token-level top-C stage (bounded per-partition state via the
  * [[graft.plans.TopK]] partial/final plan — the slot a token-level ANN
  * index fills at 100 TB; see [[IncrementalVectors.ivfSearch]] for the
  * store-served variant of that stage), a candidate-doc gather, and an
  * EXACT MaxSim re-rank paid only on |Q|·C candidate docs. Setting
  * `cPerToken` ≥ the corpus doc count degenerates pruned to brute
  * bit-exactly (spec-pinned), the [[Matryoshka]] probe-everything
  * property. */
object LateInteraction {

  /** Token view over a flat per-vector table: vectors are grouped into
    * documents of `tokensPerDoc` consecutive ids — (doc, pos, emb, nrm).
    * Row-local arithmetic only (no shuffle); norms via the codegen'd
    * native expression. */
  def tokenView(emb: DataFrame, tokensPerDoc: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(expr(s"$idCol div $tokensPerDoc").as("doc"),
      pmod(col(idCol), lit(tokensPerDoc)).cast("int").as("pos"),
      col(vecCol).as("emb"),
      Similarity.norm(col(vecCol)).as("nrm"))

  private def qSide(queryDocs: DataFrame): DataFrame =
    queryDocs.select(col("doc").as("qdoc"), col("pos").as("qpos"),
      col("emb").as("qe"), col("nrm").as("qn"))

  private def cosine = round(
    graft.functions.VectorExpressions.dotF(col("qe"), col("emb")) /
      (col("qn") * col("nrm")), 6)

  /** All (query token × candidate token) cosines for candidates outside
    * the query's own doc — scan-local past the broadcast. */
  private def scoredPairs(tokens: DataFrame, q: DataFrame): DataFrame =
    tokens.join(broadcast(q), col("doc") =!= col("qdoc"))
      .select(col("qdoc"), col("qpos"), col("doc").as("cdoc"),
        col("pos").as("cpos"), cosine.as("cos"))

  /** (qdoc, cdoc, qpos, cos) → per-query top-`k` MaxSim ranking. The
    * unbounded ranking runs through [[graft.plans.TopK.perKey]] (partial
    * per-partition heaps, no global sort); the rank column is assigned
    * on the ≤k survivors. */
  private def rankMaxSim(scored: DataFrame, k: Int): DataFrame = {
    val per = scored.groupBy("qdoc", "cdoc", "qpos")
      .agg(max(col("cos")).cast("decimal(18,6)").as("m"))
      .groupBy("qdoc", "cdoc")
      .agg(sum(col("m")).cast("double").as("score"))
    val top = graft.plans.TopK.perKey(per, Seq("qdoc"),
      Seq(("score", false), ("cdoc", true)), k)
    // bounded frame: ≤ k rows per query survive the TopK plan
    val w = Window.partitionBy("qdoc").orderBy(col("score").desc, col("cdoc"))
    top.withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("qdoc"), col("rank"), col("cdoc"), col("score"))
  }

  /** Exact MaxSim top-`k` — every candidate token scored (the audit
    * baseline; at scale use [[maxSimPruned]]). */
  def maxSimBrute(tokens: DataFrame, queryDocs: DataFrame,
      k: Int = 10): DataFrame =
    rankMaxSim(scoredPairs(tokens, qSide(queryDocs)), k)

  /** Exact MaxSim re-rank over an externally nominated (qdoc, cdoc)
    * candidate set — the second stage shared by every late-interaction
    * serving path: [[maxSimPruned]] nominates by exact token top-C, the
    * store-served q171 path nominates through the persisted IVF index
    * ([[IncrementalVectors.ivfSearch]] per query token), and a filtered
    * deployment composes [[IncrementalStore.allowFilter]] into `cand`.
    * The re-rank recomputes every retained cosine exactly — nomination
    * can only LOSE candidates, never mis-score one. `cand` is
    * |Q|·C-bounded by contract (broadcast). */
  def rerank(tokens: DataFrame, queryDocs: DataFrame, cand: DataFrame,
      k: Int = 10): DataFrame = {
    val q = qSide(queryDocs)
    val gathered = tokens.join(
        broadcast(cand.select(col("cdoc").as("doc")).distinct()), Seq("doc"))
      .join(broadcast(q), col("doc") =!= col("qdoc"))
      .select(col("qdoc"), col("qpos"), col("doc").as("cdoc"),
        col("pos").as("cpos"), cosine.as("cos"))
      // keep only (qdoc, cdoc) pairs the nominations produced — a doc
      // nominated for query A must not enter query B's re-rank
      .join(broadcast(cand.select("qdoc", "cdoc")), Seq("qdoc", "cdoc"),
        "left_semi")
    rankMaxSim(gathered, k)
  }

  /** [[rerank]] over a COMPRESSED token store — the PLAID shape
    * (Santhanam et al., "PLAID: An Efficient Engine for Late Interaction
    * Retrieval", CIKM'22): a serving fleet at token-vector scale cannot
    * hold float32 token embeddings, so the exact re-rank gathers
    * SQ8-RECONSTRUCTED candidate token components (`recon` — the
    * [[SQ.reconstruct]] row form `(id, dim, xh)`, ids grouped into docs
    * of `tokensPerDoc` consecutive ids) while queries stay exact — the
    * [[IncrementalSQ.search]] asymmetric-serve convention applied to the
    * multi-vector family. Determinism follows the SQ side for everything
    * reconstructed (per-term round-12 DECIMAL sums for dots and
    * candidate norms) and the MaxSim contract for the rest (cosine
    * rounded to 6, per-query-token max over rounded values, DECIMAL
    * MaxSim sum, ties by cdoc).
    *
    * Scale shape: `cand` is |Q|·C-bounded by contract (broadcast, as in
    * [[rerank]]); the gather semi-joins the code-store scan down to the
    * nominated docs' token rows BEFORE any arithmetic; every aggregate
    * past the gather is candidate-bounded. The store-sized work — encode
    * — was paid at ingestion, once per row ever. */
  def rerankReconstructed(recon: DataFrame, queryDocs: DataFrame,
      cand: DataFrame, k: Int = 10, tokensPerDoc: Int = 8): DataFrame = {
    // exact query tokens in (dim)-keyed row form — the asymmetric side
    val q = queryDocs.select(col("doc").as("qdoc"), col("pos").as("qpos"),
        col("nrm").as("qn"), posexplode(col("emb")).as(Seq("dim", "qx")))
      .select(col("qdoc"), col("qpos"), col("qn"), col("dim"),
        col("qx").cast("double").as("qx"))
    val rtok = recon.select(
      expr(s"id div $tokensPerDoc").as("cdoc"),
      pmod(col("id"), lit(tokensPerDoc)).cast("int").as("cpos"),
      col("dim"), col("xh"))
    val gathered = rtok.join(
      broadcast(cand.select(col("cdoc")).distinct()), Seq("cdoc"))
    // reconstructed candidate-token norms — the SQ decimal convention
    val cn = gathered.groupBy(col("cdoc"), col("cpos"))
      .agg(sqrt(sum(round(col("xh") * col("xh"), 12).cast("decimal(28,12)"))
        .cast("double")).as("cn"))
    val dots = gathered.join(broadcast(q), Seq("dim"))
      .filter(col("qdoc") =!= col("cdoc"))
      // the NOMINATED (qdoc, cdoc) pairs gate BEFORE the per-dim sum —
      // a doc nominated for query A must not enter query B's re-rank,
      // and filtering after the aggregate (the round-15 ADVICE low)
      // would make the dot groupBy |Q|×|nominated docs|-sized instead of
      // the |Q|·C candidate bound this path's contract claims
      .join(broadcast(cand.select("qdoc", "cdoc")), Seq("qdoc", "cdoc"),
        "left_semi")
      .groupBy(col("qdoc"), col("qpos"), col("qn"), col("cdoc"), col("cpos"))
      .agg(sum(round(col("qx") * col("xh"), 12).cast("decimal(28,12)"))
        .cast("double").as("dot"))
    val scored = dots.join(broadcast(cn), Seq("cdoc", "cpos"))
      .select(col("qdoc"), col("qpos"), col("cdoc"),
        round(col("dot") / (col("qn") * col("cn")), 6).as("cos"))
    rankMaxSim(scored, k)
  }

  /** Two-stage late-interaction serving (the deployed ColBERT shape):
    * per QUERY TOKEN, the top-`cPerToken` corpus tokens by cosine
    * (total order: cos DESC, cdoc, cpos) nominate their documents; the
    * union of nominated docs is gathered and re-ranked by EXACT MaxSim
    * ([[rerank]]). */
  def maxSimPruned(tokens: DataFrame, queryDocs: DataFrame, k: Int = 10,
      cPerToken: Int = 16): DataFrame = {
    val q = qSide(queryDocs)
    val topC = graft.plans.TopK.perKey(
      scoredPairs(tokens, q), Seq("qdoc", "qpos"),
      Seq(("cos", false), ("cdoc", true), ("cpos", true)), cPerToken)
    // |Q|·C nominations → a broadcast-sized candidate-doc set; the
    // gather joins the token table once, broadcast side bounded
    rerank(tokens, queryDocs,
      topC.select(col("qdoc"), col("cdoc")).distinct(), k)
  }
}

package graft.operators

import graft.functions.{Fnv64, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection by importance resampling — DSIR (Xie et al., "Data
  * Selection for Language Models via Importance Resampling",
  * NeurIPS'23, arXiv:2302.03169): score every raw document by how much
  * more likely its hashed n-gram features are under a TARGET distribution
  * (the high-quality set you want more of) than under the RAW pool, then
  * resample proportionally. The per-document score is the log importance
  * weight  Σ_f c_f · [ln p̂_target(f) − ln p̂_raw(f)]  over hashed
  * unigram features with add-1 smoothing.
  */
object Importance {

  /** Log importance weight per document.
    *
    * Features are HASHED (FNV-1a of the token, mod `buckets`) exactly as
    * DSIR prescribes: the model tables are then FIXED-SIZE (`buckets`
    * rows) regardless of corpus size — at 100 TB the two distributions
    * still fit in one broadcast, and vocabulary growth can never skew the
    * feature join. Smoothing is add-1 over the bucket space, so buckets
    * never seen in either distribution contribute a well-defined ratio.
    *
    * Plan: one explode+aggregate for per-(doc, bucket) counts (the only
    * data-sized shuffle), two bucket-space aggregates (≤ `buckets` rows
    * each) merged into a broadcast log-ratio table, one broadcast join,
    * one per-doc rollup. Determinism: each (doc, bucket) contribution is
    * rounded to 6 then summed through DECIMAL — order-independent,
    * replayable by any engine (q75/q77 convention).
    *
    * Output: (doc_id, n_tokens, log_ratio) — log_ratio > 0 means "looks
    * more like the target than like the pool"; resampling keeps docs with
    * probability ∝ exp(log_ratio) clipped, which downstream q79-style
    * deterministic weighted sampling implements. */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 8192,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val feats = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("is_target"),
        pmod(Fnv64.fnv64(col("w")), lit(buckets.toLong)).as("f"))

    // bucket-space model tables: raw = the whole pool (target included),
    // per DSIR's "raw" being the distribution you sample FROM
    val rawCnt = feats.groupBy("f").agg(count(lit(1)).as("c_raw"))
    val tgtCnt = feats.filter(col("is_target"))
      .groupBy("f").agg(count(lit(1)).as("c_tgt"))
    val nRaw = feats.agg(count(lit(1)).as("n_raw"))
    val nTgt = feats.filter(col("is_target")).agg(count(lit(1)).as("n_tgt"))
    val ratio = rawCnt.join(tgtCnt, Seq("f"), "left")
      .na.fill(0L, Seq("c_tgt"))
      .crossJoin(broadcast(nRaw)).crossJoin(broadcast(nTgt))
      .select(col("f"),
        (log((col("c_tgt") + 1).cast("double") / (col("n_tgt") + buckets)) -
          log((col("c_raw") + 1).cast("double") / (col("n_raw") + buckets)))
          .as("lr"))

    val perDoc = feats.groupBy("doc_id", "f").agg(count(lit(1)).as("c"))
    perDoc.join(broadcast(ratio), "f")
      .select(col("doc_id"), col("c"),
        round(col("c") * col("lr"), 6).cast("decimal(18,6)").as("contrib"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("contrib")).cast("double").as("log_ratio"))
      .orderBy(col("doc_id"))
  }
}

package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation operators — the composed pipeline steps an
  * LLM training-data system runs over raw documents. Every step is a pure
  * column/window transform (no UDFs, no driver-side loops), so the pipeline
  * is one declarative plan that Catalyst fuses; at 100 TB each step is a
  * scan-local transform except the dedup window (one shuffle on the dedup
  * key) and the pack window (one shuffle on the group key).
  */
object Corpus {

  /** Language + quality gate, then exact-dedup keeping the lowest id per
    * text. Returns surviving docs with their scores attached. */
  def cleanFilter(docs: DataFrame, minQuality: Double, keepLangs: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val perText = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    docs
      .withColumn("pred_lang", TextFunctions.langId(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .filter(col("pred_lang").isin(keepLangs: _*) && col("quality") >= minQuality)
      .withColumn("__rn", row_number().over(perText))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Deterministic train/val/test assignment (id-hash modulo, no RNG state —
    * reproducible across runs and engines). 8/1/1 by default. */
  def datasetSplit(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("split",
      when(pmod(col(idCol), lit(10)) < 8, "train")
        .when(pmod(col(idCol), lit(10)) === 8, "val")
        .otherwise("test"))

  /** Sequence packing: fill fixed token-budget packs in id order within each
    * group (greedy sequential fill; pack boundary = running token total
    * before this doc, integer-divided by the budget). One window per group —
    * deterministic, engine-independent integer arithmetic. */
  def sequencePack(docs: DataFrame, tokenBudget: Int, groupCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("est_tokens",
        ceil(length(col(textCol)).cast("double") / 4.0).cast("bigint"))
      .withColumn("cum_tokens", sum(col("est_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("est_tokens")).cast("double") / tokenBudget)
          .cast("bigint"))
      .select(col(idCol), col(groupCol), col("est_tokens"), col("pack_id"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental cross-date exact-substring (repeated-span) detection — the
  * [[IncrementalDedup]] contract applied to the q101/q102 window-hash
  * family: each ingestion date tokenizes and hashes ITS OWN documents'
  * n-token windows ONCE, appends per-hash COUNTS to a persistent store
  * under its date partition, and any report joins window hashes against
  * the accumulated counts (Σ over dates ≥ 2 ⇒ duplicated somewhere in the
  * all-time corpus, including within this batch).
  *
  * Counts are ADDITIVE state — the sum over date partitions equals the
  * count over the union corpus, independent of how ingestion was split —
  * which is exactly what makes the incremental report equal the
  * from-scratch [[Corpus.repeatedSpans]] (pinned in IncrementalSpansSpec
  * and oracle-gated as q109 against q101's SQL). The expensive pass (text
  * tokenize + n-gram hash) happens once per document, ever; a daily
  * report touches only the new docs' grams plus one aggregate over the
  * store's compact fixed-width (h, cnt) rows.
  *
  * Idempotence mirrors the split engine's markers: a re-run date
  * overwrites only its own `ds=` partition (dynamic partition overwrite),
  * so retries never double-count. */
object IncrementalSpans {

  /** Hash one date's documents and append their per-hash window counts
    * under that date's partition (idempotent re-run). */
  def appendCounts(docs: DataFrame, store: String, date: String, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    StoreMaintenance.withAppendLease(docs.sparkSession, store) {
      Corpus.spanGrams(docs, n, idCol, textCol)._2
        .groupBy(col("h")).agg(count(lit(1)).as("cnt"))
        .withColumn("ds", lit(date))
        .write.mode("overwrite").partitionBy("ds")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store)
    }
  }

  /** Hashes duplicated ANYWHERE in the accumulated store (Σ cnt ≥ 2).
    * Corpus-sized — keep it distributed, never broadcast it. */
  def dupHashes(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(store)
      .groupBy(col("h")).agg(sum(col("cnt")).as("total"))
      .filter(col("total") >= 2)
      .select(col("h"))

  /** Per-doc span report for `docs` measured against the accumulated
    * store: same output contract as [[Corpus.repeatedSpans]]
    * (doc, n_windows, n_dup_windows, dup_ratio), but "duplicated" means
    * duplicated across EVERY ingested date, not just within `docs`. */
  def report(docs: DataFrame, store: String, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (base, grams) = Corpus.spanGrams(docs, n, idCol, textCol)
    Corpus.spanReport(base, grams, dupHashes(docs.sparkSession, store), idCol)
  }
}

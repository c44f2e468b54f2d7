package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IncrementalSpansSpec extends SparkSpec {

  test("incremental count store converges to the from-scratch batch report") {
    val tmp = java.nio.file.Files.createTempDirectory("ispans").toString
    val store = s"$tmp/spanstore"
    val docs = Tables.load(spark, sf, "documents")
    (0 until 3).foreach { d =>
      IncrementalSpans.appendCounts(
        docs.filter(pmod(col("doc_id"), lit(3L)) === d), store, s"d$d")
    }
    val inc = IncrementalSpans.report(docs, store)
    val batch = Corpus.repeatedSpans(docs)
    assert(inc.exceptAll(batch).isEmpty && batch.exceptAll(inc).isEmpty,
      "incremental report must equal from-scratch repeatedSpans")
    // the corpus actually contains cross-date duplicate spans (the
    // invariant would be vacuous otherwise)
    assert(inc.filter(col("n_dup_windows") > 0).count() > 0)
  }

  test("re-appending a date is idempotent (dynamic partition overwrite)") {
    val tmp = java.nio.file.Files.createTempDirectory("ispans2").toString
    val store = s"$tmp/spanstore"
    val docs = Tables.load(spark, sf, "documents")
    val half = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
    IncrementalSpans.appendCounts(half, store, "d0")
    val once = spark.read.parquet(store)
      .agg(sum("cnt")).head().getLong(0)
    // a retried batch overwrites its own partition, never double-counts
    IncrementalSpans.appendCounts(half, store, "d0")
    val twice = spark.read.parquet(store)
      .agg(sum("cnt")).head().getLong(0)
    assert(once == twice)
    // dup decisions follow the accumulated counts, not the last batch:
    // ingesting the other half can only add duplicated hashes
    val dupBefore = IncrementalSpans.dupHashes(spark, store).count()
    IncrementalSpans.appendCounts(
      docs.filter(pmod(col("doc_id"), lit(2L)) === 1), store, "d1")
    val dupAfter = IncrementalSpans.dupHashes(spark, store).count()
    assert(dupAfter >= dupBefore)
  }
}

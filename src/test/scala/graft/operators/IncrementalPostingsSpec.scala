package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IncrementalPostingsSpec extends SparkSpec {

  test("incremental tf store converges to the from-scratch postings build") {
    val tmp = java.nio.file.Files.createTempDirectory("ipost").toString
    val store = s"$tmp/tfstore"
    val docs = Tables.load(spark, sf, "documents")
    (0 until 3).foreach { d =>
      IncrementalPostings.appendCounts(
        docs.filter(pmod(col("doc_id"), lit(3L)) === d), store, s"d$d")
    }
    val inc = IncrementalPostings.report(spark, store)
    val batch = Search.postings(docs)
    assert(inc.exceptAll(batch).isEmpty && batch.exceptAll(inc).isEmpty,
      "incremental report must equal from-scratch postings")
    assert(inc.count() > 0)
  }

  test("re-appending a date is idempotent (dynamic partition overwrite)") {
    val tmp = java.nio.file.Files.createTempDirectory("ipost2").toString
    val store = s"$tmp/tfstore"
    val docs = Tables.load(spark, sf, "documents")
    val half = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
    IncrementalPostings.appendCounts(half, store, "d0")
    val once = spark.read.parquet(store).agg(sum("tf")).head().getLong(0)
    IncrementalPostings.appendCounts(half, store, "d0")
    val twice = spark.read.parquet(store).agg(sum("tf")).head().getLong(0)
    assert(once == twice)
    // df grows monotonically as new docs arrive, never shrinks
    val dfBefore = IncrementalPostings.report(spark, store)
      .select("term", "df").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    IncrementalPostings.appendCounts(
      docs.filter(pmod(col("doc_id"), lit(2L)) === 1), store, "d1")
    val dfAfter = IncrementalPostings.report(spark, store)
      .select("term", "df").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfBefore.forall { case (t, d) => dfAfter.getOrElse(t, 0L) >= d })
  }
}

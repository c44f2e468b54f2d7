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

  test("bucketed tf store matches the from-scratch build and reports with zero hash exchanges") {
    val docs = Tables.load(spark, sf, "documents")
    spark.sql("DROP TABLE IF EXISTS tf_store_bkt")
    try {
      (0 until 3).foreach { d =>
        IncrementalPostings.appendCountsBucketed(
          docs.filter(pmod(col("doc_id"), lit(3L)) === d), "tf_store_bkt", s"d$d")
      }
      val bucketed = IncrementalPostings.reportBucketed(spark, "tf_store_bkt")
      val batch = Search.postings(docs)
      assert(bucketed.exceptAll(batch).isEmpty && batch.exceptAll(bucketed).isEmpty,
        "bucketed-store report must equal the from-scratch postings build")
      // scale shape: every keyed stage (tf merge, df/cf agg, top-k window,
      // stats join) runs on the bucket layout — the only exchange left is
      // the output ORDER BY's rangepartitioning (the total-order contract);
      // broadcast off so the stats join can't hide a shuffle behind a
      // broadcast either
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        def nHashExchanges(df: org.apache.spark.sql.DataFrame): Int =
          "Exchange hashpartitioning".r
            .findAllIn(df.queryExecution.executedPlan.toString).size
        val bkt = IncrementalPostings.reportBucketed(spark, "tf_store_bkt")
        assert(nHashExchanges(bkt) == 0,
          s"bucketed report must not reshuffle the store:\n${bkt.queryExecution.executedPlan}")
        // the plain parquet store pays those shuffles on every report
        val tmp = java.nio.file.Files.createTempDirectory("ipost-bkt").toString
        val store = s"$tmp/tfstore"
        (0 until 3).foreach { d =>
          IncrementalPostings.appendCounts(
            docs.filter(pmod(col("doc_id"), lit(3L)) === d), store, s"d$d")
        }
        val parquet = IncrementalPostings.report(spark, store)
        assert(nHashExchanges(parquet) >= 2,
          "parquet-store report should shuffle the tf merge + term stats")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS tf_store_bkt")
  }

  test("empty documents never enter the norms store: store-served BM25 equals one-shot") {
    // a whitespace-only and an empty doc, ids disjoint from the corpus
    val docs = Tables.load(spark, sf, "documents").limit(200)
      .select("doc_id", "text")
      .unionByName(spark.range(2).select(
        (col("id") + 900000000L).as("doc_id"),
        when(col("id") === 0, lit("   ")).otherwise(lit("")).as("text")))
    val t = "tf_store_emptydoc"
    Seq(t, s"${t}_dl").foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    try {
      (0 until 2).foreach { d =>
        val slice = docs.filter(pmod(col("doc_id"), lit(2L)) === d)
        IncrementalPostings.appendCountsBucketed(slice, t, s"d$d")
        IncrementalPostings.appendNorms(slice, t, s"d$d")
      }
      assert(spark.table(s"${t}_dl")
        .filter(col("doc_id") >= 900000000L).isEmpty,
        "zero-token docs must be excluded from the norms store (dl > 0)")
      val served = IncrementalPostings
        .bm25Bucketed(spark, t, Seq("data", "query"))
      val oneShot = Search.bm25(docs, Seq("data", "query"))
      assert(served.exceptAll(oneShot).isEmpty &&
        oneShot.exceptAll(served).isEmpty,
        "store-served BM25 must equal the one-shot scores on a corpus " +
          "containing empty documents (n_docs/avgdl parity)")
    } finally Seq(t, s"${t}_dl")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
  }

  test("compactNorms strips legacy dl=0 rows from a pre-filter store") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
      .select("doc_id", "text")
    val t = "tf_store_norms_mig"
    Seq(t, s"${t}_dl").foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    try {
      (0 until 2).foreach { d =>
        val slice = docs.filter(pmod(col("doc_id"), lit(2L)) === d)
        IncrementalPostings.appendCountsBucketed(slice, t, s"d$d")
        IncrementalPostings.appendNorms(slice, t, s"d$d")
      }
      val want = IncrementalPostings
        .bm25Bucketed(spark, t, Seq("data", "query")).localCheckpoint()
      // a norms table written BEFORE appendNorms gained its dl > 0 filter:
      // inject a whitespace-only doc's dl=0 row the way the old code did
      spark.range(1).select((col("id") + 900000000L).as("doc_id"),
          lit(0L).as("dl"), lit("d9").as("ds"))
        .write.mode("append").partitionBy("ds")
        .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(s"${t}_dl")
      assert(spark.table(s"${t}_dl").filter(col("dl") === 0).count() == 1)
      // the documented migration: one compactNorms pass drops the rows
      IncrementalPostings.compactNorms(spark, t, "d9")
      assert(spark.table(s"${t}_dl").filter(col("dl") === 0).isEmpty,
        "the fold's normsMerge must strip dl=0 rows")
      val served = IncrementalPostings
        .bm25Bucketed(spark, t, Seq("data", "query"))
      assert(served.exceptAll(want).isEmpty && want.exceptAll(served).isEmpty,
        "store-served BM25 must re-converge after the migration fold")
    } finally Seq(t, s"${t}_dl")
      .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
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

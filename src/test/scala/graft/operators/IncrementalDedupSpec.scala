package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IncrementalDedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("incremental day-by-day union equals the from-scratch batch result") {
    val store = Files.createTempDirectory("incdedup").toString + "/sigs"
    // partition the corpus into two ingestion "dates"
    val day1 = docs.filter(col("doc_id") % 2 === 0)
    val day2 = docs.filter(col("doc_id") % 2 === 1)

    val p1 = IncrementalDedup.processDate(spark, day1, store, "d1").collect().toSet
    val p2 = IncrementalDedup.processDate(spark, day2, store, "d2").collect().toSet

    // batch reference: signatures over the whole corpus at once, all pairs
    val allSigs = Dedup.minhashSignatures(docs)
    val batch = IncrementalDedup.newPairs(allSigs, allSigs).collect().toSet

    // every batch pair is found by exactly one incremental step:
    // day1-internal pairs on d1; day2-internal + cross pairs on d2
    assert((p1 ++ p2) == batch,
      s"incremental ${p1.size}+${p2.size} vs batch ${batch.size}; " +
        s"missing=${(batch -- p1 -- p2).take(5)} extra=${(p1 ++ p2 -- batch).take(5)}")
    assert(p1.intersect(p2).isEmpty, "a pair must be reported on exactly one day")
  }

  test("signatures are batch-independent (mergeable state)") {
    val day1 = docs.filter(col("doc_id") % 2 === 0)
    val split = Dedup.minhashSignatures(day1)
      .unionAll(Dedup.minhashSignatures(docs.filter(col("doc_id") % 2 === 1)))
    val whole = Dedup.minhashSignatures(docs)
    assert(split.exceptAll(whole).isEmpty && whole.exceptAll(split).isEmpty)
  }

  test("bucketed store matches the parquet-store path and joins exchange-free") {
    val store = Files.createTempDirectory("incdedup-bkt").toString + "/sigs"
    val day1 = docs.filter(col("doc_id") % 2 === 0)
    val day2 = docs.filter(col("doc_id") % 2 === 1)
    spark.sql("DROP TABLE IF EXISTS sig_store_bkt")
    try {
      // collect each day's pairs BEFORE the next append: the table read is
      // lazy, so a later .collect() would see later dates too
      IncrementalDedup.appendBandsBucketed(day1, "sig_store_bkt", "d1")
      val b1 = IncrementalDedup.newPairsBucketed(spark, "sig_store_bkt", "d1")
        .collect().toSet
      IncrementalDedup.appendBandsBucketed(day2, "sig_store_bkt", "d2")
      val b2 = IncrementalDedup.newPairsBucketed(spark, "sig_store_bkt", "d2")
        .collect().toSet

      val p1 = IncrementalDedup.processDate(spark, day1, store, "d1").collect().toSet
      val p2 = IncrementalDedup.processDate(spark, day2, store, "d2").collect().toSet
      assert(b1 == p1)
      assert(b2 == p2)

      // scale shape: with broadcast off, the parquet path must exchange both
      // join sides; the bucketed path's only exchange is the pair-dedup —
      // the store itself never reshuffles
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        def nExchanges(df: org.apache.spark.sql.DataFrame): Int =
          "Exchange hashpartitioning".r
            .findAllIn(df.queryExecution.executedPlan.toString).size
        val bucketed = IncrementalDedup.newPairsBucketed(spark, "sig_store_bkt", "d2")
        val all = IncrementalDedup.loadSignatures(spark, store)
        val parquet = IncrementalDedup.newPairs(all.filter(col("ds") === "d2"), all)
        assert(nExchanges(bucketed) <= 1,
          s"bucketed join must not reshuffle the store:\n${bucketed.queryExecution.executedPlan}")
        assert(nExchanges(parquet) >= 3, "parquet path should shuffle both sides + dedup")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS sig_store_bkt")
  }

  test("newPairs fails fast when caller k exceeds the stored signature length") {
    val sigs = Dedup.minhashSignatures(docs, k = 16) // store written with k=16
    val ex = intercept[Exception] {
      IncrementalDedup.newPairs(sigs, sigs, threshold = 0.0, k = 32).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("signature length mismatch")),
      s"expected a signature length error, got: $ex")
  }

  test("estimated jaccard tracks exact jaccard on verified pairs") {
    val sigs = Dedup.minhashSignatures(docs)
    val est = IncrementalDedup.newPairs(sigs, sigs, threshold = 0.5)
    val exact = Dedup.ngramJaccard(docs, 0.3) // wide net for the join
    val joined = est.join(exact, Seq("a_id", "b_id"))
      .select(abs(col("est_jaccard") - col("jaccard")).as("err"))
      .agg(max(col("err"))).head.getDouble(0)
    // k=32 components: σ ≈ √(j(1−j)/32) ≤ 0.088; allow ~4σ
    assert(joined < 0.36, s"max |est - exact| = $joined")
  }
}

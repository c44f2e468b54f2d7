package graft.streaming

import graft.SparkSpec
import graft.queries.EventsQueries
import org.apache.spark.sql.functions._

/** Streaming/batch equivalence: the streaming operators must produce the
  * same results as their deterministic batch duals when draining a static
  * file with Trigger.AvailableNow. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg (complete mode) equals batch q15") {
    val stream = EventStream.hourlyAgg(EventStream.readEvents(spark, sf))
    val got = EventStream.drainToTable(spark, stream, "hourly_out", "complete")
    val want = EventsQueries.q15WindowAgg(spark, sf)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stateful streaming sessionization equals batch q17") {
    implicit val s = spark
    val stream = EventStream.sessionize(EventStream.readEvents(spark, sf))
    val raw = EventStream.drainToTable(spark, stream.toDF(), "sessions_out", "update")
    // update mode re-emits per batch: keep the final (max-events) row per user
    val got = raw.groupBy("user_id")
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("m"))
      .select(col("user_id"), col("m.n_sessions").as("n_sessions"),
        col("m.n_events").as("n_events"))
    val want = EventsQueries.q17Sessionize(spark, sf)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "session counts differ between streaming and batch")
  }

  test("streaming dedup matches batch distinct count") {
    val stream = EventStream.dedupByKey(EventStream.readEvents(spark, sf))
      .select("event_id")
    val got = EventStream.drainToTable(spark, stream, "dedup_out", "append")
    val want = graft.Tables.load(spark, sf, "events").select("event_id").distinct()
    assert(got.count() == want.count())
  }

  test("key-only dedup within watermark drops retries with differing timestamps") {
    import spark.implicits._
    // simulate at-least-once delivery: write a doubled events file where
    // the duplicate copy of each event is 1s late (different ts, same id)
    val dir = s"/tmp/graft_test_dedup_ww_${ProcessHandle.current().pid()}"
    val base = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val dup = base.withColumn("ts", col("ts") + expr("INTERVAL 1 SECOND"))
    // streaming source reads raw nanos with an explicit schema — write the
    // union back with ts as raw int64 nanos to match readEvents's contract.
    // The source globs a FILE named events.parquet, so stage the Spark
    // write (a directory) and rename its single part file out.
    base.unionAll(dup)
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_staging")
    val part = new java.io.File(s"$dir/_staging").listFiles()
      .filter(_.getName.startsWith("part-")).head
    assert(part.renameTo(new java.io.File(s"$dir/events.parquet")))
    val stream = EventStream.dedupWithinWatermark(
      EventStream.readEvents(spark, dir)).select("event_id")
    val got = EventStream.drainToTable(spark, stream, "dedup_ww_out", "append")
    val want = base.select("event_id").distinct()
    assert(got.count() == want.count(),
      s"watermark dedup must collapse retried ids: got ${got.count()}, want ${want.count()}")
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  test("stream-stream interval join equals the batch interval join") {
    // two independent source streams over the same file (self-joins of one
    // stream instance are restricted; two readers are the documented shape)
    val stream = EventStream.purchaseClickJoin(
      EventStream.readEvents(spark, sf), EventStream.readEvents(spark, sf))
    val got = EventStream.drainToTable(spark, stream, "ssjoin_out", "append")

    val ev = graft.Tables.load(spark, sf, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val want = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
    assert(got.count() > 0, "interval join should produce matches on this data")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream-stream join differs from the batch interval join")
  }

  test("watermarked append-mode windows drop nothing when data fits one batch horizon") {
    // structural check: the plan carries an event-time watermark
    val stream = EventStream.hourlyAgg(EventStream.readEvents(spark, sf))
    assert(stream.isStreaming)
    assert(stream.queryExecution.analyzed.toString.contains("EventTimeWatermark"),
      "watermark node missing from the streaming plan")
  }

  test("readEvents renders raw-nanos and timestamp[us] physical copies identically") {
    // The testdata has shipped events.ts both as INT64 TIMESTAMP(NANOS) and
    // as plain timestamp[us]; readEvents must branch on the footer schema
    // (like the batch path, Tables.scala) so both render the same instants.
    val dir = s"/tmp/graft_test_ts_render_${ProcessHandle.current().pid()}"
    def stage(df: org.apache.spark.sql.DataFrame, sub: String): String = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$sub/_staging")
      val part = new java.io.File(s"$dir/$sub/_staging").listFiles()
        .filter(_.getName.startsWith("part-")).head
      assert(part.renameTo(new java.io.File(s"$dir/$sub/events.parquet")))
      s"$dir/$sub"
    }
    val base = graft.Tables.load(spark, sf, "events").limit(2000)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val nanosDir = stage(base.withColumn("ts",
      unix_micros(col("ts").cast("timestamp")) * 1000L), "nanos")
    val microsDir = stage(base.withColumn("ts",
      col("ts").cast("timestamp_ntz")), "micros")
    val gotNanos = EventStream.drainToTable(spark,
      EventStream.hourlyAgg(EventStream.readEvents(spark, nanosDir)),
      "render_nanos_out", "complete")
    val gotMicros = EventStream.drainToTable(spark,
      EventStream.hourlyAgg(EventStream.readEvents(spark, microsDir)),
      "render_micros_out", "complete")
    assert(gotNanos.count() > 0)
    assert(gotNanos.exceptAll(gotMicros).isEmpty && gotMicros.exceptAll(gotNanos).isEmpty,
      "the two physical renderings of ts must stream to identical hourly aggs")
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  test("streaming incremental dedup: two micro-batches equal the from-scratch batch result") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("sdedup").toString
    val docs = graft.Tables.load(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val half2 = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingDedup.run(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/sigs", s"$tmp/pairs", s"$tmp/ck")
    // one addData per drained micro-batch: each plays one ingestion date
    ms.addData(half1); q.processAllAvailable()
    ms.addData(half2); q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$tmp/pairs")
      .select("a_id", "b_id", "est_jaccard")
    val sigs = graft.operators.Dedup.minhashSignatures(docs)
    val want = graft.operators.IncrementalDedup.newPairs(sigs, sigs)
    assert(got.count() > 0, "expected near-dup pairs in this corpus")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream union must equal the from-scratch batch pair set")
    // each pair is reported by exactly one micro-batch
    assert(got.groupBy("a_id", "b_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("streaming chunker: two micro-batches equal the from-scratch batch chunk table") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("schunk").toString
    val docs = graft.Tables.load(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val half2 = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingChunker.run(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/chunks", s"$tmp/ck")
    ms.addData(half1); q.processAllAvailable()
    ms.addData(half2); q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$tmp/chunks")
      .select("doc_id", "chunk_id", "n_tokens", "chunk_fp")
    val want = graft.operators.Corpus.chunk(docs)
    assert(got.count() > 0, "expected chunks from this corpus")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream union must equal the from-scratch batch chunk table")
    // every chunk belongs to exactly one micro-batch
    assert(got.groupBy("doc_id", "chunk_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("streaming spans: two micro-batches' store report equals the batch build") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("sspan").toString
    val docs = graft.Tables.load(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val half2 = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingSpans.run(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/spanstore", s"$tmp/ck")
    ms.addData(half1); q.processAllAvailable()
    ms.addData(half2); q.processAllAvailable()
    q.stop()

    val got = graft.operators.IncrementalSpans.report(docs, s"$tmp/spanstore")
    val want = graft.operators.Corpus.repeatedSpans(docs)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed store report must equal the from-scratch repeated-spans build")
  }

  test("streaming langmodel: two micro-batches' accumulated NB model equals the batch train") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("slang").toString
    val docs = graft.Tables.load(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val half2 = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingLangModel.run(
      ms.toDF().toDF("doc_id", "lang", "text"),
      s"$tmp/lmstore", s"$tmp/ck")
    ms.addData(half1); q.processAllAvailable()
    ms.addData(half2); q.processAllAvailable()
    q.stop()

    val (model, priors) =
      graft.operators.IncrementalLangModel.model(spark, s"$tmp/lmstore")
    // the one-shot train over the union corpus: the exact append-side
    // expressions (holdout rule included), computed in-statement
    val isTrain = pmod(graft.functions.Fnv64.fnv64(
      col("doc_id").cast("string")), lit(100L)) < 50
    val wantModel = docs.filter(isTrain)
      .select(col("lang").as("cand"), graft.functions.CharNgramRows
        .charNgramRows(col("text"), 3).as("tri"))
      .groupBy(col("cand"), col("tri")).agg(count(lit(1)).as("c"))
    val wantPriors = docs.filter(isTrain)
      .groupBy(col("lang").as("cand")).agg(count(lit(1)).as("ndl"))
    assert(model.count() > 0 && priors.count() > 0)
    assert(model.exceptAll(wantModel).isEmpty &&
      wantModel.exceptAll(model).isEmpty,
      "streamed trigram sums must equal the one-shot train")
    assert(priors.exceptAll(wantPriors).isEmpty &&
      wantPriors.exceptAll(priors).isEmpty,
      "streamed priors must equal the one-shot train")
  }

  test("streaming postings: two micro-batches' store reports equal the batch build") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("spost").toString
    val docs = graft.Tables.load(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val half2 = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingPostings.run(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/tfstore", s"$tmp/ck")
    ms.addData(half1); q.processAllAvailable()
    ms.addData(half2); q.processAllAvailable()
    q.stop()

    val got = graft.operators.IncrementalPostings.report(spark, s"$tmp/tfstore")
    val want = graft.operators.Search.postings(docs)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed store report must equal the from-scratch postings build")
  }

  test("streaming bucketed postings+norms: BM25 served from the streamed store equals batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("sbm25").toString
    val pid = ProcessHandle.current().pid()
    val sT = s"graft_sbm25_stream_$pid"
    val bT = s"graft_sbm25_batch_$pid"
    val all = Seq(sT, bT).flatMap(t => Seq(t, s"${t}_dl"))
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = graft.Tables.load(spark, sf, "documents")
      (0 until 2).foreach { d =>
        val slice = docs.filter(col("doc_id") % 2 === d)
        graft.operators.IncrementalPostings
          .appendCountsBucketed(slice, bT, s"d$d")
        graft.operators.IncrementalPostings.appendNorms(slice, bT, s"d$d")
      }
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      val q = StreamingPostings.runBucketed(
        ms.toDF().toDF("doc_id", "text"), sT, s"$tmp/ck")
      (0 until 2).foreach { d =>
        ms.addData(docs.filter(col("doc_id") % 2 === d)
          .select("doc_id", "text").as[(Long, String)].collect().toSeq)
        q.processAllAvailable()
      }
      q.stop()
      val want = graft.operators.IncrementalPostings
        .bm25Bucketed(spark, bT, Seq("data", "query")).localCheckpoint()
      val got = graft.operators.IncrementalPostings
        .bm25Bucketed(spark, sT, Seq("data", "query"))
      assert(want.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "streamed lexical store must serve the batch store's BM25 bit-equal")
    } finally all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming suppression: a takedown committed mid-stream keeps re-delivered ids out from the next batch on") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("ssuppress").toString
    val pid = ProcessHandle.current().pid()
    val sT = s"graft_ssup_stream_$pid"
    val cT = s"graft_ssup_ctl_$pid"
    val all = Seq(sT, cT).flatMap(t => Seq(t, s"${t}_dl"))
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = graft.Tables.load(spark, sf, "documents")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      // the suppression feed reads the ledger PER BATCH — the point of
      // this test: the takedown commits while the stream is running
      val q = StreamingPostings.runBucketed(
        ms.toDF().toDF("doc_id", "text"), sT, s"$tmp/ck",
        suppress = Some(Suppression.filterBatch(_,
          s"$tmp/req", s"$tmp/markers")))
      // batch 0: nothing taken down yet — everything (requested ids
      // included) ingests
      ms.addData(docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text").as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      // a takedown batch commits mid-stream: erase the % 7 = 3 history
      // from the streamed store AND arm the suppression feed
      docs.filter(col("doc_id") % 7 === 3).select("doc_id")
        .write.mode("overwrite").parquet(s"$tmp/req/r0.parquet")
      new graft.operators.TakedownJob(spark, graft.operators.TakedownConfig(
        "td", s"$tmp/req", s"$tmp/markers",
        Seq(graft.operators.TakedownFamily("post", (ids, gen) =>
          graft.operators.IncrementalPostings
            .deleteDocs(spark, sT, ids, gen))))).run()
      // batch 1 RE-DELIVERS its % 7 = 3 ids — suppressed before append
      ms.addData(docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text").as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
      q.stop()
      // no requested id anywhere in the streamed store
      val leaked = spark.table(sT).join(
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"),
        Seq("doc_id"), "left_semi")
      assert(leaked.isEmpty,
        "a committed takedown id must not survive the stream")
      // and the serve equals a store built over the survivors
      (0 until 2).foreach { d =>
        val slice = docs.filter(col("doc_id") % 2 === d &&
          col("doc_id") % 7 =!= 3)
        graft.operators.IncrementalPostings
          .appendCountsBucketed(slice, cT, s"d$d")
        graft.operators.IncrementalPostings.appendNorms(slice, cT, s"d$d")
      }
      val want = graft.operators.IncrementalPostings
        .bm25Bucketed(spark, cT, Seq("data", "query")).localCheckpoint()
      val got = graft.operators.IncrementalPostings
        .bm25Bucketed(spark, sT, Seq("data", "query"))
      assert(want.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "takedown + suppression must compose to survivors-only, streamed")
    } finally all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming vector store: streamed micro-batches serve the batch-built store's searches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("svec").toString
    val pid = ProcessHandle.current().pid()
    val sBase = s"graft_svec_stream_$pid"
    val bBase = s"graft_svec_batch_$pid"
    val all = Seq(sBase, bBase).flatMap(b =>
      Seq("_cb", "_ctr", "_codes", "_cells", "_map").map(b + _))
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val emb = graft.Tables.load(spark, sf, "embeddings")
    def slice(d: Int) = emb.filter(pmod(col("vec_id"), lit(3L)) === d)
    // model training is deterministic, so both stores freeze identical
    // models from the same initial slice
    graft.operators.IncrementalVectors.initModel(slice(0), sBase)
    graft.operators.IncrementalVectors.initModel(slice(0), bBase)
    (0 until 3).foreach { d =>
      graft.operators.IncrementalVectors.appendDate(slice(d), bBase, s"d$d")
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Array[Float])]
    val q = StreamingVectors.run(ms.toDF().toDF("vec_id", "embedding"),
      sBase, s"$tmp/ck")
    (0 until 3).foreach { d =>
      ms.addData(slice(d).select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect().toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val queries = emb.filter(col("vec_id") < 10)
    val wantAdc = graft.operators.IncrementalVectors
      .adcSearch(spark, bBase, queries).localCheckpoint()
    val gotAdc = graft.operators.IncrementalVectors
      .adcSearch(spark, sBase, queries)
    assert(wantAdc.count() > 0)
    assert(gotAdc.exceptAll(wantAdc).isEmpty && wantAdc.exceptAll(gotAdc).isEmpty,
      "streamed store must serve the batch store's ADC results bit-equal")
    val wantIvf = graft.operators.IncrementalVectors
      .ivfSearch(spark, bBase, queries)
    val gotIvf = graft.operators.IncrementalVectors
      .ivfSearch(spark, sBase, queries)
    assert(wantIvf.count() > 0)
    assert(gotIvf.exceptAll(wantIvf).isEmpty && wantIvf.exceptAll(gotIvf).isEmpty,
      "streamed store must serve the batch store's IVF results bit-equal")

    // at-least-once safety: replaying a micro-batch (drop-then-append,
    // exactly the foreachBatch body) leaves the store row-identical
    val before = spark.table(s"${sBase}_codes").count()
    graft.operators.IncrementalVectors.dropDate(spark, sBase, "b1")
    graft.operators.IncrementalVectors.appendDate(slice(1), sBase, "b1")
    assert(spark.table(s"${sBase}_codes").count() == before,
      "a replayed micro-batch must replace its partition, not double it")
    val replayed = graft.operators.IncrementalVectors
      .adcSearch(spark, sBase, queries)
    assert(replayed.exceptAll(wantAdc).isEmpty && wantAdc.exceptAll(replayed).isEmpty,
      "searches must be unchanged after a micro-batch replay")
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming components: micro-batched labels equal from-scratch clustering") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("scomp").toString
    val docs = graft.Tables.load(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").as[(Long, String)].collect()
    val half2 = docs.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = StreamingComponents.run(ms.toDF().toDF("doc_id", "text"),
      s"$tmp/store", s"$tmp/ck")
    ms.addData(half1); q.processAllAvailable()
    ms.addData(half2); q.processAllAvailable()
    q.stop()

    val got = graft.operators.IncrementalComponents
      .currentLabels(spark, s"$tmp/store/labels", s"$tmp/store/repmap")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.operators.Components
      .connected(graft.operators.Dedup.minhashLsh(docs, 0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got == want,
      s"stream ${got.size} vs batch ${want.size}; " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")

    // the crash window between the label write and the rep-map write
    // HEALS on replay: drop the latest rep-map version, replay the last
    // micro-batch's processDate, and the labels come back identical
    val repmapDirs = Option(new java.io.File(s"$tmp/store/repmap").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).sorted
    if (repmapDirs.nonEmpty) {
      val latest = repmapDirs.last
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/store/repmap/$latest"), true)
      val all = spark.read.parquet(s"$tmp/store/corpus")
        .select(col("doc_id"), col("text"))
      graft.operators.IncrementalComponents.processDate(spark,
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text"), all,
        s"$tmp/store/sigs", s"$tmp/store/labels", s"$tmp/store/repmap",
        StreamingComponents.batchDs(1))
      val healed = graft.operators.IncrementalComponents
        .currentLabels(spark, s"$tmp/store/labels", s"$tmp/store/repmap")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(healed == want, "a replayed batch must restore the lost merges")
    }
  }

  test("streaming takedowns: streamed deletes == from-scratch-minus-docs; re-delivered ids no-op") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("stomb").toString
    val pid = ProcessHandle.current().pid()
    val sT = s"graft_stomb_stream_$pid"
    val bT = s"graft_stomb_batch_$pid"
    val all = Seq(sT, bT).flatMap(t => Seq(t, s"${t}_dl"))
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = graft.Tables.load(spark, sf, "documents")
      // the store under takedown: full corpus, two ingestion dates
      (0 until 2).foreach { d =>
        val slice = docs.filter(col("doc_id") % 2 === d)
        graft.operators.IncrementalPostings
          .appendCountsBucketed(slice, sT, s"d$d")
        graft.operators.IncrementalPostings.appendNorms(slice, sT, s"d$d")
      }
      // the from-scratch-minus-docs reference: survivors only
      val keep = docs.filter(col("doc_id") % 7 =!= 3)
      (0 until 2).foreach { d =>
        val slice = keep.filter(col("doc_id") % 2 === d)
        graft.operators.IncrementalPostings
          .appendCountsBucketed(slice, bT, s"d$d")
        graft.operators.IncrementalPostings.appendNorms(slice, bT, s"d$d")
      }
      val gone = docs.filter(col("doc_id") % 7 === 3)
        .select("doc_id").as[Long].collect().toSeq.sorted
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[Long]
      val q = StreamingTombstones.run(ms.toDF().toDF("doc_id"), s"$tmp/ck",
        deletes = Seq((ids, gen) => graft.operators.IncrementalPostings
          .deleteDocs(spark, sT, ids, gen)))
      val (half1, half2) = gone.splitAt(gone.size / 2)
      ms.addData(half1); q.processAllAvailable()
      ms.addData(half2); q.processAllAvailable()
      // an id delivered AGAIN (at-least-once upstream) must be harmless
      ms.addData(half1.take(2)); q.processAllAvailable()
      // and an empty trigger must not pay a rewrite (guard: no exception,
      // store unchanged — covered by the equality below)
      ms.addData(Seq.empty[Long]); q.processAllAvailable()
      q.stop()
      val got = graft.operators.IncrementalPostings
        .bm25Bucketed(spark, sT, Seq("data", "query"))
      val want = graft.operators.IncrementalPostings
        .bm25Bucketed(spark, bT, Seq("data", "query"))
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "streamed takedowns must serve from-scratch-minus-docs BM25")
      // retention: the rows are GONE from both tables, not masked
      val goneDf = gone.toDF("doc_id")
      assert(spark.table(sT).join(goneDf, "doc_id").isEmpty &&
        spark.table(s"${sT}_dl").join(goneDf, "doc_id").isEmpty,
        "tombstoned rows must be physically absent from the store tables")
    } finally {
      all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("streaming semantic store: per-batch pair reports union to the exact pair set, each pair once — single- AND two-level") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the clustered fixture: 40 directions × 5 noisy copies
    def vec(base: Int, copy: Int): Array[Float] = {
      val r = new scala.util.Random(base)
      val b = Array.fill(64)(r.nextGaussian())
      val rn = new scala.util.Random(base * 1000 + copy + 1)
      b.map(x => (x + 0.02 * rn.nextGaussian()).toFloat)
    }
    val rows = for (b <- 0 until 40; c <- 0 until 5)
      yield (b * 5L + c, vec(b, c))
    val df = rows.toDF("vec_id", "embedding")
    // both frozen configs through the SAME dual: the two-level store's
    // composite-key rows must stream exactly like the single-level ones
    // (streamed == batch == exact under engagement — the q179 gate's
    // streaming edition)
    Seq(None, Some(true)).foreach { twoLevel =>
      val tmp = java.nio.file.Files.createTempDirectory("ssem").toString
      val base = s"graft_ssem_p${ProcessHandle.current().pid()}" +
        (if (twoLevel.isDefined) "_2l" else "")
      Seq("_cfg", "_bands", "_vecs", "_occ").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS $base$sfx"))
      try {
        graft.operators.IncrementalSemantic.initModel(df, base,
          horizonRows = rows.size.toLong, twoLevel = twoLevel)
        val got = scala.collection.mutable.ListBuffer
          .empty[(Long, Long, Double)]
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
        val ms = MemoryStream[(Long, Array[Float])]
        val q = StreamingSemantic.run(
          ms.toDF().toDF("vec_id", "embedding"), base, s"$tmp/ck",
          threshold = 0.95,
          onNewPairs = p => got ++= p.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
        val (h1, h2) = rows.partition(_._1 % 2 == 0)
        ms.addData(h1); q.processAllAvailable()
        ms.addData(h2); q.processAllAvailable()
        q.stop()
        val want = graft.operators.Similarity.cosineNearDup(df, 0.95)
          .as[(Long, Long, Double)].collect().toSet
        assert(want.size >= 400, "fixture must have real near-dup mass")
        assert(got.size == got.toSet.size,
          s"a pair must surface in exactly one micro-batch (twoLevel=$twoLevel)")
        assert(got.toSet == want,
          s"streamed reports must union to the exact pair set (twoLevel=$twoLevel)")
      } finally {
        Seq("_cfg", "_bands", "_vecs", "_occ").foreach(sfx =>
          spark.sql(s"DROP TABLE IF EXISTS $base$sfx"))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      }
    }
  }

  test("streaming NB unlearn: labels stream in, takedowns stream in — model equals from-scratch over survivors") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("snbu").toString
    val sStore = s"$tmp/stream"; val bStore = s"$tmp/batch"
    try {
      val docs = graft.Tables.load(spark, sf, "documents")
        .select("doc_id", "lang", "text")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.as[(Long, String, String)].collect().toSeq
      // LABELS STREAM IN: two micro-batches append counts (the q145
      // additive-model contract through foreachBatch)
      val msDocs = MemoryStream[(Long, String, String)]
      val qIn = msDocs.toDF().toDF("doc_id", "lang", "text").writeStream
        .option("checkpointLocation", s"$tmp/ckIn")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.operators.IncrementalLangModel.appendCounts(b, sStore, s"b$id")
        }.start()
      val (h1, h2) = rows(docs).partition(_._1 % 2 == 0)
      msDocs.addData(h1); qIn.processAllAvailable()
      msDocs.addData(h2); qIn.processAllAvailable()
      qIn.stop()
      // TAKEDOWNS STREAM IN: full documents ride along (the subtract
      // family needs text+label); the processed-ids ledger makes
      // at-least-once delivery an exactly-once EFFECT — a re-delivered
      // doc in a LATER batch must NOT subtract twice
      val gone = docs.filter(col("doc_id") % 7 === 3)
      val msTomb = MemoryStream[(Long, String, String)]
      val qT = StreamingTombstones.run(
        msTomb.toDF().toDF("doc_id", "lang", "text"), s"$tmp/ckT",
        deletes = Seq((b, gen) => graft.operators.IncrementalLangModel
          .deleteDocs(b, sStore, gen)),
        processedLog = Some(s"$tmp/takedown_log"))
      val (g1, g2) = rows(gone).splitAt(rows(gone).size / 2)
      msTomb.addData(g1); qT.processAllAvailable()
      msTomb.addData(g2); qT.processAllAvailable()
      // at-least-once upstream: a slice of batch 1 arrives AGAIN in a
      // later batch — the ledger must absorb it (double-subtraction
      // would corrupt the counting model silently)
      msTomb.addData(g1.take(3)); qT.processAllAvailable()
      msTomb.addData(Seq.empty[(Long, String, String)])
      qT.processAllAvailable()
      qT.stop()
      // reference: ONE from-scratch count pass over the survivors — a
      // green equality proves streamed ingest + streamed unlearn IS the
      // retrained model (the q166 exactness, micro-batch edition)
      graft.operators.IncrementalLangModel.appendCounts(
        docs.filter(col("doc_id") % 7 =!= 3), bStore, "d0")
      val (sTri, sPri) = graft.operators.IncrementalLangModel.model(spark, sStore)
      val (bTri, bPri) = graft.operators.IncrementalLangModel.model(spark, bStore)
      assert(sTri.count() > 0 && sPri.count() > 0)
      assert(sTri.exceptAll(bTri).isEmpty && bTri.exceptAll(sTri).isEmpty,
        "streamed trigram counts must equal the survivor retrain")
      assert(sPri.exceptAll(bPri).isEmpty && bPri.exceptAll(sPri).isEmpty,
        "streamed priors must equal the survivor retrain")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("duplicated micro-batch delivery: SUBTRACT families' stores equal single delivery at every crash point") {
    // the round-15 verdict ask: exactly-once EFFECT pinned per subtract
    // family under a REPLAYED batch (same batchId — the crash-replay
    // Structured Streaming actually performs), not just later-batch
    // re-delivery. Two crash points: (a) after the ledger append landed
    // (the ledger absorbs the replay), and (b) after the deletes but
    // BEFORE the ledger append, with an ingestion append landing before
    // the replay — the scenario where the per-family same-gen no-op is
    // the only shield, and where the round-15 fold rule would have
    // DROPPED the completed generation.
    import org.apache.spark.sql.functions.pmod
    val tmp = java.nio.file.Files.createTempDirectory("sdup").toString
    val spansS = s"$tmp/spans"; val nbS = s"$tmp/nb"
    val spansR = s"$tmp/spans_ref"; val nbR = s"$tmp/nb_ref"
    try {
      val docs = graft.Tables.load(spark, sf, "documents")
        .select("doc_id", "lang", "text")
      graft.operators.IncrementalSpans.appendCounts(docs, spansS, "d0")
      graft.operators.IncrementalLangModel.appendCounts(docs, nbS, "d0")
      // the takedown batch, as a REPLAYABLE file source (MemoryStream
      // cannot replay across restarts; a file source re-reads the exact
      // offset range from the checkpoint's offset log)
      val gone = docs.filter(col("doc_id") % 7 === 3)
      gone.coalesce(1).write.parquet(s"$tmp/req")
      def run(): Unit = {
        def attempt(): Unit = {
          val q = StreamingTombstones.run(
            spark.readStream.schema(docs.schema).parquet(s"$tmp/req"),
            s"$tmp/ckT",
            deletes = Seq(
              (b, gen) => graft.operators.IncrementalSpans
                .deleteDocs(b, spansS, gen),
              (b, gen) => graft.operators.IncrementalLangModel
                .deleteDocs(b, nbS, gen)),
            availableNow = true,
            processedLog = Some(s"$tmp/log"))
          q.awaitTermination(); q.stop()
        }
        // a terminated query releases its checkpoint in-use lock through
        // an ASYNC listener event — a quick same-checkpoint restart can
        // race it (test-only artifact: real restarts are new JVMs).
        // Retry the restart while the stale lock drains.
        var tries = 0
        var done = false
        while (!done) {
          try { attempt(); done = true }
          catch {
            case e: org.apache.spark.sql.streaming.StreamingQueryException
                if e.getMessage.contains("concurrently using")
                  && tries < 50 =>
              tries += 1; Thread.sleep(200)
          }
        }
      }
      def spanCounts() = spark.read.parquet(spansS)
        .groupBy(col("h")).agg(sum(col("cnt")).as("cnt"))
      def replayBatch0(): Unit = {
        // crash simulation: the batch ran but its commit record was lost
        // — on restart the engine re-executes batch 0 with the SAME data
        val c0 = new java.io.File(s"$tmp/ckT/commits/0")
        assert(c0.exists(), "batch 0 must have committed in the prior run")
        assert(c0.delete())
        run()
      }
      run() // single delivery
      val spansOnce = spanCounts().localCheckpoint()
      val (triOnce, priOnce) = graft.operators.IncrementalLangModel
        .model(spark, nbS)
      val (triPin, priPin) = (triOnce.localCheckpoint(),
        priOnce.localCheckpoint())
      // (a) replay AFTER the ledger append: the ledger filters the whole
      // batch away — both stores bit-unchanged
      replayBatch0()
      assert(spanCounts().exceptAll(spansOnce).isEmpty &&
        spansOnce.exceptAll(spanCounts()).isEmpty,
        "spans: ledger-absorbed replay must not re-subtract")
      val (triA, priA) = graft.operators.IncrementalLangModel.model(spark, nbS)
      assert(triA.exceptAll(triPin).isEmpty && triPin.exceptAll(triA).isEmpty
        && priA.exceptAll(priPin).isEmpty && priPin.exceptAll(priA).isEmpty,
        "NB: ledger-absorbed replay must not re-subtract")
      // (b) replay with the LEDGER LOST (crash between the last delete
      // and the ledger append) AND a fresh ingestion date landed first:
      // the same-gen no-op must absorb the re-run without discarding the
      // folded generation or the fresh date
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(s"$tmp/log"))
      val d1 = docs.filter(pmod(col("doc_id"), lit(7L)) === 1)
      graft.operators.IncrementalSpans.appendCounts(d1, spansS, "d1")
      graft.operators.IncrementalLangModel.appendCounts(d1, nbS, "d1")
      replayBatch0()
      // reference: from-scratch stores over the survivors, plus the same
      // d1 ingestion — what a single delivery would have left behind
      graft.operators.IncrementalSpans.appendCounts(
        docs.filter(col("doc_id") % 7 =!= 3), spansR, "d0")
      graft.operators.IncrementalSpans.appendCounts(d1, spansR, "d1")
      graft.operators.IncrementalLangModel.appendCounts(
        docs.filter(col("doc_id") % 7 =!= 3), nbR, "d0")
      graft.operators.IncrementalLangModel.appendCounts(d1, nbR, "d1")
      val wantSpans = spark.read.parquet(spansR)
        .groupBy(col("h")).agg(sum(col("cnt")).as("cnt"))
      assert(spanCounts().exceptAll(wantSpans).isEmpty &&
        wantSpans.exceptAll(spanCounts()).isEmpty,
        "spans: ledger-lost replay must no-op, keeping the fold AND the fresh date")
      val (triB, priB) = graft.operators.IncrementalLangModel.model(spark, nbS)
      val (triW, priW) = graft.operators.IncrementalLangModel.model(spark, nbR)
      assert(triB.exceptAll(triW).isEmpty && triW.exceptAll(triB).isEmpty
        && priB.exceptAll(priW).isEmpty && priW.exceptAll(priB).isEmpty,
        "NB: ledger-lost replay must equal single delivery + the fresh date")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("two tombstone streams on one store compose: batch-id gens must not alias") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("stomb2").toString
    val pid = ProcessHandle.current().pid()
    val sT = s"graft_stomb2_stream_$pid"
    val bT = s"graft_stomb2_batch_$pid"
    val all = Seq(sT, bT).flatMap(t => Seq(t, s"${t}_dl"))
    all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val docs = graft.Tables.load(spark, sf, "documents")
      graft.operators.IncrementalPostings.appendCountsBucketed(docs, sT, "d0")
      graft.operators.IncrementalPostings.appendNorms(docs, sT, "d0")
      val keep = docs.filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 7 =!= 5)
      graft.operators.IncrementalPostings.appendCountsBucketed(keep, bT, "d0")
      graft.operators.IncrementalPostings.appendNorms(keep, bT, "d0")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def ids(m: Long) = docs.filter(col("doc_id") % 7 === m)
        .select("doc_id").as[Long].collect().toSeq
      val del = Seq((t: org.apache.spark.sql.DataFrame, gen: String) =>
        graft.operators.IncrementalPostings.deleteDocs(spark, sT, t, gen))
      // two INDEPENDENT request streams (own checkpoints) target the same
      // store — e.g. per-jurisdiction takedown queues. Both start at
      // batch 0: with bare-batch-id generations the second stream's
      // rewrite would alias the first's consumed `r_b0` gen and no-op,
      // silently skipping its deletions. The checkpoint-hash nonce in
      // the gen is what this pins.
      val msA = MemoryStream[Long]
      val qA = StreamingTombstones.run(msA.toDF().toDF("doc_id"),
        s"$tmp/ckA", deletes = del)
      msA.addData(ids(3)); qA.processAllAvailable(); qA.stop()
      val msB = MemoryStream[Long]
      val qB = StreamingTombstones.run(msB.toDF().toDF("doc_id"),
        s"$tmp/ckB", deletes = del)
      msB.addData(ids(5)); qB.processAllAvailable(); qB.stop()
      val got = graft.operators.IncrementalPostings
        .bm25Bucketed(spark, sT, Seq("data", "query"))
      val want = graft.operators.IncrementalPostings
        .bm25Bucketed(spark, bT, Seq("data", "query"))
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "both streams' takedowns must land — batch-id gens aliased")
      assert(spark.table(sT)
        .join(ids(5).toDF("doc_id"), "doc_id").isEmpty,
        "the second stream's ids must be physically gone")
    } finally {
      all.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}

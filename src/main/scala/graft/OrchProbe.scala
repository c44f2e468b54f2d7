package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe pricing the ORCHESTRATION LAYER's growth (round-17
  * verdict "Next" #8): q181 (curate) and q182 (takedown) are the two
  * most expensive lifecycle queries, and their dates/batches run
  * SEQUENTIALLY BY DESIGN (reference semantics; each date's appends
  * already fan out across all executors) — a decision that deserves a
  * number like every other design decision in the README. The probe
  * measures each orchestrator's wall time in BOTH growth axes:
  *
  *   - CORPUS 10× (dates × families fixed): base-SF vs 10×-SF corpus
  *     split into the same 3 dates over the same q181 family trio
  *     (postings + minhash + semantic, day reports as-of each date).
  *     Ratio ≈ data ratio ⇒ the orchestrator adds no super-linear
  *     term; the cost is the families' own distributed appends.
  *   - DATES 3× (corpus fixed): the SAME base corpus split into 9
  *     dates instead of 3. Total row work is identical, so the ratio
  *     prices exactly the per-date fixed overhead (ledger listing,
  *     drop DDL, per-family job scheduling, report write, marker) that
  *     sequential dates multiply — the number that says whether daily
  *     cadence at years of dates is orchestrator-bound or data-bound.
  *
  * Same two axes for the takedown dual (batches over a postings store:
  * each batch = one marker-committed store rewrite, so batch count is
  * the expensive axis by construction and staging requests into
  * per-window dated files — the scaladoc's advice — is what the 3×
  * batches row prices).
  *
  * Usage: runMain graft.OrchProbe [baseDir] [bigDir] [reps] */
object OrchProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val bigDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def stats(label: String, xs: Seq[Double]): Double = {
      val s = xs.sorted
      val med = s(s.size / 2)
      println(f"$label%-38s med ${med}%8.3f s  min ${s.head}%8.3f  " +
        f"max ${s.last}%8.3f  (${xs.size} reps)")
      med
    }
    def corpus(dir: String): DataFrame =
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .join(Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding")),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("id"), col("text"), col("embedding"))
        .localCheckpoint()

    val base = "graft_orchprobe"
    val allTbls = Seq("_post", "_post_dl", "_mh", "_sem_cfg", "_sem_cfg_prev",
      "_sem_bands", "_sem_vecs", "_sem_occ")
    def dropStore(): Unit =
      allTbls.foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $base$sfx"))

    // ---- curate axis: nDates drops over corpus c. `withSemantic`
    // adds the embedding family (the full q181 trio — requires an
    // `embedding` column, i.e. the docs⋈embeddings corpus, which is
    // EMBEDDINGS-bounded at test SFs: 500→2,000 rows base→big, so the
    // trio only prices the DATES axis); the text-family pair runs over
    // the raw documents table, whose base→big growth is a true 10× —
    // the CORPUS axis.
    def curateRun(c: DataFrame, n: Long, nDates: Int,
        withSemantic: Boolean): Double = {
      val tmp = s"/tmp/graft_orchprobe"
      dropStore()
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      (0 until nDates).foreach(d =>
        c.filter(pmod(col("id"), lit(nDates.toLong)) === d)
          .write.mode("overwrite").parquet(s"$tmp/in/d$d.parquet"))
      if (withSemantic) graft.operators.IncrementalSemantic.initModel(
        c.select(col("id").as("vec_id"), col("embedding")),
        s"${base}_sem", horizonRows = n)
      val textFamilies = Seq(
        graft.operators.CurateFamily("minhash",
          append = (slice, d) => graft.operators.IncrementalDedup
            .appendBandsBucketed(
              slice.select(col("id").as("doc_id"), col("text")),
              s"${base}_mh", d),
          drop = (sp, d) => graft.operators.IncrementalStore
            .dropDate(sp, Seq(s"${base}_mh"), d),
          report = Some((sp, d) => graft.operators.IncrementalDedup
            .newPairsBucketed(sp, s"${base}_mh", d, threshold = 0.2,
              upTo = Some(d)))),
        graft.operators.CurateFamily("postings",
          append = (slice, d) => {
            graft.operators.IncrementalPostings.appendCountsBucketed(
              slice.select(col("id").as("doc_id"), col("text")),
              s"${base}_post", d)
            graft.operators.IncrementalPostings.appendNorms(
              slice.select(col("id").as("doc_id"), col("text")),
              s"${base}_post", d)
          },
          drop = (sp, d) => graft.operators.IncrementalStore
            .dropDate(sp, Seq(s"${base}_post", s"${base}_post_dl"), d)))
      val semFamily = Seq(
        graft.operators.CurateFamily("semantic",
          append = (slice, d) => graft.operators.IncrementalSemantic
            .appendDate(
              slice.select(col("id").as("vec_id"), col("embedding")),
              s"${base}_sem", d),
          drop = (sp, d) => graft.operators.IncrementalSemantic
            .dropDate(sp, s"${base}_sem", d),
          report = Some((sp, d) => graft.operators.IncrementalSemantic
            .newPairs(sp, s"${base}_sem", d, 0.9, upTo = Some(d)))))
      val families =
        if (withSemantic) textFamilies ++ semFamily else textFamilies
      val dt = timed {
        val s = new graft.operators.CurateJob(spark,
          graft.operators.CurateConfig("orch", s"$tmp/in", s"$tmp/markers",
            s"$tmp/reports", families)).run()
        require(s.processedDates.size == nDates, s.toString)
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      dt
    }

    // ---- takedown axis: nBatches dated request files over postings ----
    def takedownRun(docs: DataFrame, nBatches: Int): Double = {
      val tmp = s"/tmp/graft_orchprobe_td"
      dropStore()
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      (0 until 3).foreach { d =>
        val slice = docs.filter(pmod(col("doc_id"), lit(3L)) === d)
        graft.operators.IncrementalPostings
          .appendCountsBucketed(slice, s"${base}_post", s"d$d")
        graft.operators.IncrementalPostings
          .appendNorms(slice, s"${base}_post", s"d$d")
      }
      (0 until nBatches).foreach(b =>
        docs.filter(pmod(col("doc_id"), lit(37L)) === b).select("doc_id")
          .write.mode("overwrite").parquet(s"$tmp/req/r$b.parquet"))
      val fams = Seq(graft.operators.TakedownFamily("postings",
        (ids, gen) => graft.operators.IncrementalPostings.deleteDocs(
          spark, s"${base}_post", ids, gen)))
      val dt = timed {
        val s = new graft.operators.TakedownJob(spark,
          graft.operators.TakedownConfig("orch", s"$tmp/req",
            s"$tmp/markers", fams)).run()
        require(s.processedDates.size == nBatches, s.toString)
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      dt
    }

    val cBase = corpus(baseDir); val nBase = cBase.count()
    val dBase = Tables.load(spark, baseDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val dBig = Tables.load(spark, bigDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nDocsBase = dBase.count(); val nDocsBig = dBig.count()
    println(s"doc rows: base=$nDocsBase big=$nDocsBig " +
      f"(${nDocsBig.toDouble / nDocsBase}%.1fx); " +
      s"joined corpus (embeddings-bounded): $nBase")
    def textCorpus(d: DataFrame): DataFrame =
      d.select(col("doc_id").as("id"), col("text"))

    // warm JIT: one full cycle of each shape
    curateRun(cBase, nBase, 3, withSemantic = true)
    curateRun(textCorpus(dBase), nDocsBase, 3, withSemantic = false)
    takedownRun(dBase, 2)

    // CORPUS axis on the text families (true 10× docs growth)
    val c1 = stats("curate text-fams 3 dates, base",
      (0 until reps).map(_ =>
        curateRun(textCorpus(dBase), nDocsBase, 3, withSemantic = false)))
    val c2 = stats("curate text-fams 3 dates, 10x docs",
      (0 until reps).map(_ =>
        curateRun(textCorpus(dBig), nDocsBig, 3, withSemantic = false)))
    // DATES axis on the full q181 trio (same rows, 3 vs 9 drops)
    val c3 = stats("curate trio 3 dates, base",
      (0 until reps).map(_ => curateRun(cBase, nBase, 3, withSemantic = true)))
    val c4 = stats("curate trio 9 dates, base",
      (0 until reps).map(_ => curateRun(cBase, nBase, 9, withSemantic = true)))
    println(f"curate corpus-10x ratio: ${c2 / c1}%.2f  " +
      f"(data ${nDocsBig.toDouble / nDocsBase}%.1fx); " +
      f"dates-3x ratio: ${c4 / c3}%.2f " +
      "(same rows; the gap over 1.0 is per-date fixed overhead x6)")

    val t1 = stats("takedown 2 batches, base corpus",
      (0 until reps).map(_ => takedownRun(dBase, 2)))
    val t2 = stats("takedown 2 batches, 10x corpus",
      (0 until reps).map(_ => takedownRun(dBig, 2)))
    val t3 = stats("takedown 6 batches, base corpus",
      (0 until reps).map(_ => takedownRun(dBase, 6)))
    println(f"takedown corpus-10x ratio: ${t2 / t1}%.2f; " +
      f"batches-3x ratio: ${t3 / t1}%.2f " +
      "(each batch is one marker-committed store rewrite by design — " +
      "batch requests into per-window files)")

    dropStore()
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the ORCHESTRATOR LEDGER scale shape — the round-17
  * orchestration layer's driver-side claims, measured:
  *   1. the marker-ledger core (list input stems, list done markers,
  *      sorted anti-join — the [[graft.split.MarkerLedger]] path every
  *      orchestrator run pays once) at TEN YEARS of daily partitions
  *      (3,650 dates, half done) — the claim is "driver-side strings,
  *      ledger stays tiny at 100 TB";
  *   2. the takedown SUPPRESSION FEED
  *      ([[graft.operators.TakedownJob.appliedIds]] — union+distinct of
  *      every committed request batch) at 200 committed batches × 500
  *      ids, and the per-ingestion anti-join of a corpus-day slice
  *      against it — the claim is "list×history-sized, never
  *      corpus-sized", i.e. the suppression join must cost like the id
  *      list, not like the store.
  *
  * Usage: runMain graft.LedgerProbe [sfDir] */
object LedgerProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    val root = s"/tmp/graft_ledgerprobe_${ProcessHandle.current().pid()}"
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    def bench(label: String, reps: Int)(body: => Unit): Double = {
      (0 until 2).foreach(_ => body) // warm
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => body)
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"$label%-52s ${ms}%10.2f ms/op  (x$reps)")
      ms
    }

    // ---- 1. the ledger core at 10 years of daily partitions ----------
    val nDates = 3650
    val ledger = new graft.split.MarkerLedger(conf)
    (0 until nDates).foreach { i =>
      val d = f"2016-${1 + i / 310}%02d-x$i%04d" // unique sortable stems
      fs.create(new org.apache.hadoop.fs.Path(
        s"$root/in/$d.parquet"), true).close()
      if (i % 2 == 0)
        fs.create(new org.apache.hadoop.fs.Path(
          s"$root/markers/$d.json"), true).close()
    }
    var missing = 0
    bench(s"ledger FLAT: list $nDates inputs + markers + anti-join", 20) {
      val in = ledger.listStemsFlat(s"$root/in", ".parquet")
      val done = ledger.listStemsFlat(s"$root/markers", ".json")
      missing = (in -- done).toSeq.sorted.size
    }
    println(s"  -> ${nDates / 2} missing of $nDates (got $missing)")
    // the split engine's pinned RECURSIVE walk (§2.2.5), for contrast —
    // the orchestrators deliberately do not pay this
    bench(s"ledger recursive (split quirk): same anti-join", 3) {
      val in = ledger.listStems(s"$root/in", ".parquet")
      val done = ledger.listStems(s"$root/markers", ".json")
      missing = (in -- done).toSeq.sorted.size
    }

    // ---- 2. the suppression feed at 200 batches x 500 ids ------------
    val nBatches = 200
    val idsPerBatch = 500
    val tdLedger = new graft.split.MarkerLedger(conf)
    (0 until nBatches).foreach { b =>
      spark.range(b.toLong * idsPerBatch, (b + 1).toLong * idsPerBatch)
        .select(col("id").as("doc_id"))
        .coalesce(1).write.mode("overwrite")
        .parquet(f"$root/req/r$b%04d.parquet")
      tdLedger.writeMarker(s"$root/markers_td", graft.split.Marker(
        "probe", f"r$b%04d", "x", Seq.empty, "1970-01-01T00:00:00Z"))
    }
    var feedN = 0L
    bench(s"feed: appliedIds over $nBatches batches (count)", 5) {
      feedN = graft.operators.TakedownJob
        .appliedIds(spark, s"$root/req", s"$root/markers_td").get.count()
    }
    println(s"  -> ${nBatches * idsPerBatch} ids in the feed (got $feedN)")
    // the shape appliedIds REJECTED: a per-batch N-way union — its plan
    // analysis alone dominates at history scale (kept here as the
    // counter-evidence row)
    bench(s"feed (rejected shape): $nBatches-way union (count)", 2) {
      (0 until nBatches).map { b =>
        val raw = spark.read.parquet(f"$root/req/r$b%04d.parquet")
        raw.select(col(raw.columns.head).as("id"))
      }.reduce(_ unionAll _).distinct().count()
      ()
    }

    val docs = Tables.load(spark, dir, "documents").localCheckpoint()
    val nDocs = docs.count()
    bench(s"suppress: one corpus day ($nDocs docs) anti-join feed", 5) {
      val sup = graft.operators.TakedownJob
        .appliedIds(spark, s"$root/req", s"$root/markers_td").get
      docs.join(sup.select(col("id").as("doc_id")), Seq("doc_id"),
        "left_anti").count()
      ()
    }
    bench(s"baseline: one corpus day ($nDocs docs) count only", 5) {
      docs.count(); ()
    }

    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the READER-SIDE FOLD-CONSISTENCY overhead — the
  * round-15 verdict's serve-regression watch item: every family serve
  * reads its tables through `IncrementalStore.consistentScan`
  * ([[graft.operators.StoreMaintenance.consistentTable]]), which pays one
  * driver filesystem listing (`pendingFolds`) per table per PLAN
  * CONSTRUCTION. The top r14→r15 bench movers (q128 1.50×, q136 1.39×,
  * q168 1.24×) all read through that new path, inside the noise window —
  * this probe answers whether the resolution cost is real or noise by
  * timing it in isolation:
  *   - plan-construction latency of `consistentTable` vs a raw
  *     `spark.table` (same store, repeated, warm);
  *   - an end-to-end serve (the q128-shape BM25 report) planned through
  *     each, executed to completion.
  *
  * Usage: runMain graft.ScanProbe [sfDir] */
object ScanProbe {
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
    val t = "graft_scanprobe"
    Seq(t, s"${t}_dl").foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    val docs = Tables.load(spark, dir, "documents")
    graft.operators.IncrementalPostings.appendCountsBucketed(docs, t, "d0")
    graft.operators.IncrementalPostings.appendNorms(docs, t, "d0")

    def bench(label: String, reps: Int)(body: => Unit): Double = {
      (0 until 3).foreach(_ => body) // warm
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => body)
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"$label%-34s ${ms}%9.3f ms/op  (x$reps)")
      ms
    }
    // 1. plan-construction cost: the resolution is driver-side FS metadata
    val raw = bench("plan: spark.table", 200) {
      spark.table(t).queryExecution.executedPlan
      ()
    }
    val cons = bench("plan: consistentTable", 200) {
      graft.operators.StoreMaintenance.consistentTable(spark, t)
        .queryExecution.executedPlan
      ()
    }
    println(f"plan-construction overhead: ${cons - raw}%.3f ms/op " +
      f"(${cons / raw}%.2fx)")
    // 2. end-to-end serve: the q128-shape store-served BM25 report (reads
    //    the store through consistentScan internally)
    bench("serve: bm25Bucketed (consistent)", 10) {
      graft.operators.IncrementalPostings
        .bm25Bucketed(spark, t, Seq("data", "query")).count()
      ()
    }
    Seq(t, s"${t}_dl").foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    spark.stop()
  }
}

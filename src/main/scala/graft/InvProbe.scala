package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe for the LEDGER-KEYED INVENTORY scale shape — the r18
  * verdict's ask #5: [[graft.operators.StoreInventory.missingVsLedger]]
  * pays, per family, one SHOW PARTITIONS, one marker-dir listing
  * (shared), a bounded sidecar/expiry-record read per generation label,
  * and a driver-side per-(marker × family) comparison loop. The claim
  * is "driver-side metadata only, ledger scale shape" — this measures
  * it at TEN YEARS of committed daily dates (3,650 markers) × 4
  * families, in the three store states a deployment actually visits:
  *
  *   1. HEALTHY: every family holds all 3,650 plain partitions — the
  *      loop is pure set-membership (no filesystem reads past the two
  *      listings);
  *   2. REWRITTEN (sidecar): one committed r_* generation label whose
  *      durable `_folded_set_*` names every date — one bounded sidecar
  *      read replaces 3,650 mtime comparisons;
  *   3. REWRITTEN (legacy, no sidecar): the mtime fallback — one label
  *      partition listing plus the per-marker `<=` comparisons.
  *
  * Usage: runMain graft.InvProbe */
object InvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    val root = s"/tmp/graft_invprobe_${ProcessHandle.current().pid()}"
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    def bench(label: String, reps: Int)(body: => Unit): Double = {
      (0 until 2).foreach(_ => body) // warm
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => body)
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"$label%-60s ${ms}%10.2f ms/op  (x$reps)")
      ms
    }

    val nDates = 3650
    val dates = (0 until nDates).map(i => f"2016-x$i%04d")
    val fams = (0 until 4).map(i => s"invprobe_f$i")

    // 3,650 committed curate markers (one flat dir — the shared listing)
    val ledger = new graft.split.MarkerLedger(conf)
    dates.foreach(d => ledger.writeMarker(s"$root/markers",
      graft.split.Marker("probe", d, "x", Seq.empty, "1970-01-01T00:00:00Z")))

    // 4 one-row partitioned tables, then 3,650 partitions each via
    // BATCHED ADD PARTITION DDL (the partitions' existence is what the
    // detector reads; their contents never are)
    fams.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a crashed prior run can leave the warehouse dir without its
      // catalog entry — saveAsTable refuses the orphan location
      fs.delete(new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(t))), true)
      Seq((1L, dates.head)).toDF("id", "ds")
        .write.partitionBy("ds").saveAsTable(t)
      dates.tail.grouped(500).foreach { g =>
        spark.sql(s"ALTER TABLE $t ADD " +
          g.map(d => s"PARTITION (ds='$d')").mkString(" "))
      }
    }
    val pairs = fams.map(f => f -> f)

    // ---- 1. healthy: 4 families x 3,650 plain partitions -------------
    var lag = 0L
    bench(s"missingVsLedger HEALTHY: 4 fams x $nDates dates", 5) {
      lag = graft.operators.StoreInventory
        .missingVsLedger(spark, pairs, s"$root/markers").count()
    }
    println(s"  -> expect 0 lagging rows (got $lag)")

    // ---- 2. gen-rewritten with the durable sidecar --------------------
    // drop all plain partitions, leave one committed r_* label whose
    // sidecar names every date (what a takedown rewrite records)
    fams.foreach { t =>
      dates.grouped(500).foreach { g =>
        // DROP takes comma-separated partition specs (ADD takes spaces)
        spark.sql(s"ALTER TABLE $t DROP " +
          g.map(d => s"PARTITION (ds='$d')").mkString(", "))
      }
      spark.sql(s"ALTER TABLE $t ADD PARTITION (ds='r_probe')")
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString
      val out = fs.create(new org.apache.hadoop.fs.Path(
        loc, "_folded_set_r_probe"), true)
      try out.writeBytes(dates.map(d => s"date:$d").mkString("\n"))
      finally out.close()
    }
    bench(s"missingVsLedger SIDECAR: 4 fams, r_* covers $nDates", 5) {
      lag = graft.operators.StoreInventory
        .missingVsLedger(spark, pairs, s"$root/markers").count()
    }
    println(s"  -> expect 0 lagging rows (got $lag)")

    // ---- 3. the legacy mtime fallback (sidecar absent) ----------------
    fams.foreach { t =>
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location.toString
      fs.delete(new org.apache.hadoop.fs.Path(loc, "_folded_set_r_probe"),
        false)
    }
    bench(s"missingVsLedger LEGACY mtime: 4 fams, r_* label", 5) {
      lag = graft.operators.StoreInventory
        .missingVsLedger(spark, pairs, s"$root/markers").count()
    }
    println(s"  -> expect 0 lagging rows (markers predate the label; got $lag)")

    fams.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}

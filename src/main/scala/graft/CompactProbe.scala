package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the POSTINGS-FAMILY drift watch item (round-16
  * verdict "What's wrong" #3): q135 (compacted postings) read 1.41×
  * r15→r16 and q120 1.20×, the only family trending up two rounds —
  * inside the noise window, and ScanProbe already exonerated the
  * consistent-scan resolution, but the repeat deserves the same
  * isolation treatment on the COMPACT path specifically. This probe
  * times, at fixed data and with warm JIT:
  *   - the 3-date bucketed tf store BUILD (the q128/q135 prefix — if the
  *     drift lives here it is ingestion cost, not the compact pass);
  *   - the COMPACT pass alone (`StoreMaintenance.compact` with the
  *     additive tf merge), on a freshly rebuilt store per rep — folds
  *     are one-shot per store, so repetition needs a rebuild;
  *   - the post-compact SERVE vs the identical UNCOMPACTED store's serve
  *     (the report both q128 and q135 end in) — the pair that separates
  *     "compaction made serving slower" from "the whole family moved".
  * Interpretation: per-stage medians close to each other across reps and
  * a post/pre serve ratio ≈ 1 ⇒ the bench movement is host drift, not a
  * regression on the compact path; a reproducible gap names the stage to
  * profile. Results land in the README evidence table (the ScanProbe
  * precedent).
  *
  * Usage: runMain graft.CompactProbe [sfDir] */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def stats(label: String, xs: Seq[Double]): Unit = {
      val s = xs.sorted
      val med = s(s.size / 2)
      println(f"$label%-28s med ${med}%7.3f s  min ${s.head}%7.3f  " +
        f"max ${s.last}%7.3f  (${xs.size} reps)")
    }

    def build(t: String): Double = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      timed {
        (0 until 3).foreach { d =>
          graft.operators.IncrementalPostings.appendCountsBucketed(
            docs.filter(pmod(col("doc_id"), lit(3L)) === d), t, s"d$d")
        }
      }
    }
    def compactPass(t: String): Double = timed {
      graft.operators.StoreMaintenance.compact(spark, t, "d1",
        merge = _.groupBy("term", "doc_id").agg(sum(col("tf")).as("tf")))
    }
    def serve(t: String): Double = timed {
      graft.operators.IncrementalPostings.reportBucketed(spark, t)
        .write.mode("overwrite").format("noop").save()
    }

    val tPre = "graft_cprobe_pre" // uncompacted control, built once
    val builds = scala.collection.mutable.ListBuffer[Double]()
    builds += build(tPre)
    // warm: one full build+compact+serve cycle before measuring
    val tW = "graft_cprobe_w"
    build(tW); compactPass(tW); serve(tW); serve(tPre)
    spark.sql(s"DROP TABLE IF EXISTS $tW")

    val reps = 5
    val compacts = scala.collection.mutable.ListBuffer[Double]()
    val servesPost = scala.collection.mutable.ListBuffer[Double]()
    val servesPre = scala.collection.mutable.ListBuffer[Double]()
    val t = "graft_cprobe"
    (0 until reps).foreach { _ =>
      builds += build(t)
      compacts += compactPass(t)
      servesPost += serve(t)
      servesPre += serve(tPre)
    }
    stats("build (3-date tf store)", builds.toSeq)
    stats("compact pass (fold d0+d1)", compacts.toSeq)
    stats("serve post-compact", servesPost.toSeq)
    stats("serve uncompacted", servesPre.toSeq)
    val ratio = servesPost.toSeq.sorted.apply(reps / 2) /
      servesPre.toSeq.sorted.apply(reps / 2)
    println(f"post/pre serve ratio (median): $ratio%.3f")
    Seq(t, tPre).foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    spark.stop()
  }
}

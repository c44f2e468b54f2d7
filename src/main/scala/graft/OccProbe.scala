package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the SEMANTIC-APPEND drift watch item (round-17
  * verdict "What's wrong" #4): q179's append phase read 12.0 → 20.1 s
  * across the round's own quiet runs and ~1.18× drift-adjusted vs
  * round 16 — plausibly the round-17 addition of the per-date `t_occ`
  * occupancy write (a fourth table, derived by reading back the
  * just-landed band partition), but never isolated. This probe times,
  * at fixed data (the sf embeddings split into 3 dates) with warm JIT,
  * the FULL 3-date append sequence with and without the occupancy
  * write ([[graft.operators.IncrementalSemantic]]'s `writeOcc`
  * isolation hook — not a supported store state, measurement only),
  * for BOTH frozen configs (single-level, forced two-level — the occ
  * feed is level-keyed, so its cost scales with the config's band
  * count). Store rebuilt per rep: appends are once-per-date events.
  * Interpretation: with/without medians within rep spread ⇒ the bench
  * movement is host drift and the summary rides the append pass for
  * free; a reproducible gap prices exactly what `bandDriftPsi`'s
  * never-re-scan-the-band-store property costs at ingestion time.
  *
  * Usage: runMain graft.OccProbe [sfDir] [reps] */
object OccProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = emb.count()

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def stats(label: String, xs: Seq[Double]): Double = {
      val s = xs.sorted
      val med = s(s.size / 2)
      println(f"$label%-34s med ${med}%7.3f s  min ${s.head}%7.3f  " +
        f"max ${s.last}%7.3f  (${xs.size} reps)")
      med
    }

    val t = "graft_oprobe"
    def dropStore(): Unit = Seq("_cfg", "_cfg_prev", "_bands", "_vecs",
      "_occ").foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $t$sfx"))
    def appendAll(twoLevel: Boolean, writeOcc: Boolean): Double = {
      dropStore()
      graft.operators.IncrementalSemantic.initModel(emb, t,
        horizonRows = n, twoLevel = Some(twoLevel))
      timed {
        (0 until 3).foreach(d =>
          graft.operators.IncrementalSemantic.appendDate(
            emb.filter(pmod(col("vec_id"), lit(3L)) === d), t, s"d$d",
            8, "vec_id", "embedding", writeOcc = writeOcc))
      }
    }

    // warm JIT: one full cycle of each codegen shape before measuring
    appendAll(twoLevel = false, writeOcc = true)
    appendAll(twoLevel = true, writeOcc = true)

    for (twoLevel <- Seq(false, true)) {
      val tag = if (twoLevel) "two-level" else "single-level"
      val withOcc = (0 until reps).map(_ =>
        appendAll(twoLevel, writeOcc = true))
      val without = (0 until reps).map(_ =>
        appendAll(twoLevel, writeOcc = false))
      val mw = stats(s"append 3 dates, $tag, with occ", withOcc)
      val mo = stats(s"append 3 dates, $tag, no occ", without)
      println(f"$tag occ overhead (median ratio): ${mw / mo}%.3f")
    }
    dropStore()
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev-only candidate-MASS probe for the banded-LSH hierarchy: counts the
  * candidate pairs the single-level and two-level schemes emit on the
  * N×-replicated embedding corpus (both at the r = 16 clamp the scaled
  * corpus derives), plus the verified-pair count — the direct measurement
  * of the 2^r/b mass cut [[graft.operators.Similarity.twoLevelEngaged]]'s
  * scaladoc claims, and the evidence row README's two-level section
  * carries. Forced engagement on both sides: the auto law would not
  * engage below 2^21 rows, which is the point — this measures what
  * engagement BUYS at the scale where single-level's pigeonhole mass is
  * already the dominant term.
  *
  * Usage: SPARK_GRAFT_SCALE=100 runMain graft.MassProbe
  */
object MassProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE", "100").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val big = ScaleProbe.ensureScaledTables(spark, n, Some(Set("embeddings")))
    val emb = Tables.load(spark, big, "embeddings")
    val rows = emb.count()
    val r = graft.operators.Similarity.derivedRowsPerBand(rows, 128)
    println(s"MassProbe: N=$rows (${n}x), derived r=$r, b=${128 / r}")
    def timedCount(label: String, engaged: Boolean): Long = {
      val t0 = System.nanoTime()
      val c = graft.operators.Similarity
        .bandedCandidatePairs(emb, 128, r, engaged).count()
      println(f"$label%-14s candidates=$c%12d  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      c
    }
    val c1 = timedCount("single-level", engaged = false)
    val c2 = timedCount("two-level", engaged = true)
    println(f"mass cut: ${c1.toDouble / c2}%.1fx fewer candidate pairs")
    // the STORE path (q178/q179): the same mass measurement through the
    // incremental semantic store's frozen config and persisted composite
    // band rows — one date ingested, the daily join's candidate stream
    // counted. BOTH configs are explicit (Some(false)/Some(true)) so the
    // probe measures what its labels claim at any scale: with the
    // defaults, a probe corpus at/above 2^21 rows would auto-engage the
    // "single-level" store and the printed cut would read 1.0x. The
    // explicit single-level init REFUSES at/above the threshold — loud,
    // which is correct: that regime has no legitimate single-level store.
    def storeCount(label: String, twoLevel: Option[Boolean]): Long = {
      val base = s"graft_massprobe_${label.replace('-', '_')}"
      Seq("_cfg", "_cfg_prev", "_bands", "_vecs", "_occ")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $base$sfx"))
      val t0 = System.nanoTime()
      graft.operators.IncrementalSemantic.initModel(emb, base,
        horizonRows = rows, twoLevel = twoLevel)
      graft.operators.IncrementalSemantic.appendDate(emb, base, "d0")
      val tIngest = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val c = graft.operators.IncrementalSemantic
        .candidatePairs(spark, base, "d0").count()
      println(f"$label%-14s candidates=$c%12d  (ingest $tIngest%.1f s, " +
        f"join ${(System.nanoTime() - t1) / 1e9}%.1f s)")
      Seq("_cfg", "_cfg_prev", "_bands", "_vecs", "_occ")
        .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $base$sfx"))
      c
    }
    val s1 = storeCount("store-1level", twoLevel = Some(false))
    val s2 = storeCount("store-2level", twoLevel = Some(true))
    println(f"store mass cut: ${s1.toDouble / s2}%.1fx fewer candidate pairs")
    spark.stop()
  }
}

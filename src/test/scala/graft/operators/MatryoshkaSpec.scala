package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MatryoshkaSpec extends SparkSpec {

  private lazy val emb = graft.Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private def slice(d: Int) =
    emb.filter(pmod(col("vec_id"), lit(3L)) === d)
  private def queries = emb.filter(col("vec_id") < 10)

  private def dropStore(base: String): Unit =
    Seq("_ctr", "_cells").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS $base$sfx"))

  private def bitEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("incremental date appends equal a one-shot build; serve bucket-prunes") {
    Seq("mat_inc", "mat_one").foreach(dropStore)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      Matryoshka.initModel(slice(0), "mat_inc")
      (0 until 3).foreach(d =>
        Matryoshka.appendDate(slice(d), "mat_inc", s"d$d"))
      Matryoshka.initModel(slice(0), "mat_one")
      Matryoshka.appendDate(emb, "mat_one", "all")
      val inc = Matryoshka.search(spark, "mat_inc", queries).localCheckpoint()
      assert(inc.count() > 0)
      assert(bitEqual(inc, Matryoshka.search(spark, "mat_one", queries)),
        "prefix assignment is a pure function of (prefix, frozen model)")
      // the model table holds PREFIX-dimensional centroids
      val dims = spark.table("mat_inc_ctr").agg(max(col("dim"))).head().getInt(0)
      assert(dims == 15, s"16-dim prefix centroids expected, max dim $dims")
      // a low-fanout query must read a strict subset of the cell buckets
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val one = Matryoshka.search(spark, "mat_inc",
        emb.filter(col("vec_id") === 0), nProbe = 2)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(one.queryExecution.executedPlan.toString)
      assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"probed-cell IN filter must bucket-prune:\n${one.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      Seq("mat_inc", "mat_one").foreach(dropStore)
    }
  }

  test("filtered serve equals a store that never ingested the excluded vectors") {
    Seq("mat_filt", "mat_fonly").foreach(dropStore)
    try {
      // same fit slice ⇒ identical frozen prefix quantizer in both stores
      Matryoshka.initModel(slice(0), "mat_filt")
      Matryoshka.appendDate(emb, "mat_filt", "all")
      Matryoshka.initModel(slice(0), "mat_fonly")
      Matryoshka.appendDate(emb.filter(col("vec_id") % 2 === 0),
        "mat_fonly", "all")
      val allowDf = emb.filter(col("vec_id") % 2 === 0).select("vec_id")
      assert(bitEqual(
        Matryoshka.search(spark, "mat_filt", queries,
          allowed = Some(allowDf)),
        Matryoshka.search(spark, "mat_fonly", queries)),
        "allow-list candidates must re-rank exactly like an allowed-only store")
    } finally Seq("mat_filt", "mat_fonly").foreach(dropStore)
  }

  test("as-of search excludes later dates' postings") {
    dropStore("mat_asof")
    try {
      Matryoshka.initModel(slice(0), "mat_asof")
      Matryoshka.appendDate(slice(0), "mat_asof", "d0")
      val atD0 = Matryoshka.search(spark, "mat_asof", queries,
        upTo = Some("d0")).localCheckpoint()
      Matryoshka.appendDate(slice(1), "mat_asof", "d1")
      Matryoshka.appendDate(slice(2), "mat_asof", "d2")
      assert(bitEqual(
        Matryoshka.search(spark, "mat_asof", queries, upTo = Some("d0")),
        atD0), "as-of d0 after d1/d2 appends must equal the d0-era search")
    } finally dropStore("mat_asof")
  }

  test("streamed micro-batches serve the batch-built store's searches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("smat").toString
    val pid = ProcessHandle.current().pid()
    val sBase = s"graft_smat_stream_$pid"
    val bBase = s"graft_smat_batch_$pid"
    Seq(sBase, bBase).foreach(dropStore)
    try {
      Matryoshka.initModel(slice(0), sBase)
      Matryoshka.initModel(slice(0), bBase)
      (0 until 3).foreach(d =>
        Matryoshka.appendDate(slice(d), bBase, s"d$d"))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.StreamingMatryoshka.run(
        ms.toDF().toDF("vec_id", "embedding"), sBase, s"$tmp/ck")
      (0 until 3).foreach { d =>
        ms.addData(slice(d).select("vec_id", "embedding")
          .as[(Long, Array[Float])].collect().toSeq)
        q.processAllAvailable()
      }
      q.stop()
      val want = Matryoshka.search(spark, bBase, queries).localCheckpoint()
      val got = Matryoshka.search(spark, sBase, queries)
      assert(want.count() > 0)
      assert(bitEqual(got, want),
        "streamed store must serve the batch store's results bit-equal")
    } finally Seq(sBase, bBase).foreach(dropStore)
  }

  test("probing every cell degenerates to exact full-dimension brute force") {
    dropStore("mat_all")
    try {
      Matryoshka.initModel(emb, "mat_all")
      Matryoshka.appendDate(emb, "mat_all", "all")
      // with nProbe = nCells stage 1 prunes nothing, so the two-stage
      // serve IS the exhaustive full-dim ranking — the cleanest possible
      // pin that stage 2 scores full-dimension cosine, not the prefix
      val served = Matryoshka.search(spark, "mat_all", queries, nProbe = 16)
      val brute = Similarity.knnBrute(queries, emb, 3)
      assert(bitEqual(served, brute),
        "full-probe matryoshka must equal brute-force top-3")
    } finally dropStore("mat_all")
  }
}

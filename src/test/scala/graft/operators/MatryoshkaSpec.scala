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

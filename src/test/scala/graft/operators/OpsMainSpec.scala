package graft.operators

import graft.{OpsMain, SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end pins for the operational CLI ([[graft.OpsMain]]): one
  * temp catalog driven through curate → maintain → takedown → curate
  * (re-crawl, suppressed) → inventory with every job configured from
  * FLAGS ALONE (`main` is the exact spark-submit surface — in-process
  * it adopts the active session and must not stop it), plus the loud
  * config refusals the registry adds (uninitialized semantic store
  * without SEM_HORIZON; half-specified suppression feed). */
class OpsMainSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val corpus = docs.select(col("doc_id"), col("text"))
    .join(Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")),
      col("doc_id") === col("vec_id"))
    .select(col("doc_id").as("id"), col("text"), col("embedding"))

  private val allTbls = Seq("_post", "_post_dl", "_mh", "_sem_cfg",
    "_sem_bands", "_sem_vecs", "_sem_occ")

  private def drop(base: String): Unit =
    allTbls.foreach(s => spark.sql(s"DROP TABLE IF EXISTS $base$s"))

  test("the triad runs from flags alone: curate, maintain, takedown, re-crawl suppressed, ledger inventory") {
    val tmp = Files.createTempDirectory("opsmain").toString
    val base = "opsm_a"
    drop(base)
    try {
      val horizon = corpus.count()
      def curArgs(extra: String*): Array[String] = (Seq(
        "--JOB", "curate", "--STORE", base,
        "--FAMILIES", "postings,minhash,semantic",
        "--IN", s"$tmp/in", "--MARKERS", s"$tmp/curmarkers",
        "--REPORTS", s"$tmp/reports",
        "--REQUESTS", s"$tmp/req", "--TD_MARKERS", s"$tmp/tdmarkers",
        "--SEM_HORIZON", horizon.toString) ++ extra).toArray

      // ingest d0+d1 (semantic store init-on-demand at d0)
      (0 until 2).foreach(d => corpus.filter(pmod(col("id"), lit(3L)) === d)
        .write.mode("overwrite").parquet(s"$tmp/in/d$d.parquet"))
      val c1 = OpsMain.run(curArgs(), spark)
      assert(c1.contains(""""processed":["d0","d1"]""") &&
        c1.contains(""""suppression_feed":true"""), c1)
      assert(spark.catalog.tableExists(s"${base}_sem_cfg"),
        "first curate run must init the semantic model")
      // re-run is a no-op (ledger)
      assert(OpsMain.run(curArgs(), spark).contains(""""processed":[]"""))
      // day reports landed per family (possibly empty — this corpus
      // plants no clones; q181/q190 gate report CONTENT via the oracle)
      Seq("minhash", "semantic").foreach(f => assert(
        new java.io.File(s"$tmp/reports/$f").isDirectory,
        s"day-report dir for $f"))

      // maintenance window at d1: postings+minhash fold, semantic audits
      val m1 = OpsMain.run(Array("--JOB", "maintain", "--STORE", base,
        "--FAMILIES", "postings,minhash,semantic", "--WINDOW", "d1",
        "--M_MARKERS", s"$tmp/mmarkers", "--AUDITS", s"$tmp/audits"),
        spark)
      assert(m1.contains(""""skipped":false""") &&
        m1.contains(""""audited":["postings","semantic"]"""), m1)
      val post = spark.sql(s"SHOW PARTITIONS ${base}_post").collect()
        .map(_.getString(0)).toSet
      assert(post == Set("ds=c_d1"), post.toString)
      assert(spark.read.parquet(s"$tmp/audits/semantic")
        .filter(col("psi").isNotNull).count() > 0, "drift audit rows")

      // takedown %7=3 across all three families (gen rewrite folds c_d1)
      docs.filter(pmod(col("doc_id"), lit(7L)) === 3).select("doc_id")
        .write.mode("overwrite").parquet(s"$tmp/req/r0.parquet")
      val t1 = OpsMain.run(Array("--JOB", "takedown", "--STORE", base,
        "--FAMILIES", "postings,minhash,semantic",
        "--REQUESTS", s"$tmp/req", "--TD_MARKERS", s"$tmp/tdmarkers"),
        spark)
      assert(t1.contains(""""processed":["r0"]"""), t1)
      assert(spark.sql(s"SHOW PARTITIONS ${base}_mh").collect()
        .map(_.getString(0)).toSet == Set("ds=r_td_r0"))

      // d2 re-delivers taken-down ids — the feed suppresses them
      corpus.filter(pmod(col("id"), lit(3L)) === 2)
        .write.mode("overwrite").parquet(s"$tmp/in/d2.parquet")
      val c2 = OpsMain.run(curArgs(), spark)
      assert(c2.contains(""""processed":["d2"]"""), c2)
      val reAdmitted = spark.table(s"${base}_sem_vecs")
        .filter(pmod(col("id"), lit(7L)) === 3).count()
      assert(reAdmitted == 0, s"suppression must hold: $reAdmitted")

      // ledger-keyed inventory: healthy through the gen rewrite…
      val invArgs = Array("--JOB", "inventory", "--STORE", base,
        "--FAMILIES", "postings,minhash,semantic",
        "--LEDGER", s"$tmp/curmarkers")
      val i1 = OpsMain.run(invArgs, spark)
      assert(i1.contains(""""detector":"ledger"""") &&
        i1.contains(""""missing":[]"""), i1)
      // …and sharp when a post-rewrite date is dropped by hand
      spark.sql(s"ALTER TABLE ${base}_mh DROP PARTITION (ds='d2')")
      val i2 = OpsMain.run(invArgs, spark)
      assert(i2.contains("""{"family":"minhash_bands","ds":"d2"}"""), i2)

      // main() is drivable in-process: adopts the session, prints, and
      // leaves it running (the spark-submit path stops only what it made)
      OpsMain.main(invArgs)
      assert(!spark.sparkContext.isStopped,
        "main must not stop an adopted session")
    } finally drop(base)
  }

  test("loud refusals: semantic without SEM_HORIZON; half a suppression feed") {
    val tmp = Files.createTempDirectory("opsmain-cfg").toString
    val base = "opsm_b"
    drop(base)
    try {
      corpus.filter(pmod(col("id"), lit(3L)) === 0).limit(50)
        .write.mode("overwrite").parquet(s"$tmp/in/d0.parquet")
      val ex = intercept[IllegalArgumentException] {
        OpsMain.run(Array("--JOB", "curate", "--STORE", base,
          "--FAMILIES", "semantic", "--IN", s"$tmp/in",
          "--MARKERS", s"$tmp/m", "--REPORTS", s"$tmp/r"), spark)
      }
      assert(ex.getMessage.contains("SEM_HORIZON"), ex.getMessage)
      val ex2 = intercept[IllegalArgumentException] {
        OpsMain.run(Array("--JOB", "curate", "--STORE", base,
          "--FAMILIES", "postings", "--IN", s"$tmp/in",
          "--MARKERS", s"$tmp/m", "--REPORTS", s"$tmp/r",
          "--REQUESTS", s"$tmp/req"), spark)
      }
      assert(ex2.getMessage.contains("TD_MARKERS"), ex2.getMessage)
    } finally drop(base)
  }
}

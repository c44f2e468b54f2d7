package graft.plans

import graft.SparkSpec

/** The SQL surface of the native expressions (installed into the shared
  * session via GraftFunctions.install — the running-session activation path;
  * the builder path wires the same Seq through injectFunction). */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate correctly") {
    GraftFunctions.install(spark)
    val r = spark.sql(
      """SELECT fnv64('a') AS fp,
        |  size(shingle_hashes('a b c d', 2)) AS n2,
        |  dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |  norm_f(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS nrm""".stripMargin)
      .head()
    assert(r.getLong(0) == 0xaf63dc4c8601ec8cL)   // FNV-1a("a")
    assert(r.getInt(1) == 3)                      // 3 bigrams of 4 tokens
    assert(math.abs(r.getDouble(2) - 11.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-12)
  }

  test("kmv_distinct is usable as a SQL aggregate") {
    GraftFunctions.install(spark)
    spark.range(0, 1000).createOrReplaceTempView("kmv_in")
    val est = spark.sql("SELECT kmv_distinct(id % 100) AS e FROM kmv_in").head().getLong(0)
    assert(est == 100L) // below k => exact
  }

  test("quant8_f is usable from SQL and matches its Column form") {
    GraftFunctions.install(spark)
    val q8 = spark.sql(
      """SELECT quant8_f(array(CAST(3.0 AS FLOAT), CAST(-4.0 AS FLOAT)),
        |  norm_f(array(CAST(3.0 AS FLOAT), CAST(-4.0 AS FLOAT)))) AS q8""".stripMargin)
      .head().getString(0)
    // norm 5: 3*127/5 = 76.2 -> 76; -4*127/5 = -101.6 -> -102 (HALF_UP)
    assert(q8 == "76,-102", s"got $q8")
  }

  test("shingle_rows works as a SQL table-generating function (LATERAL VIEW)") {
    GraftFunctions.install(spark)
    spark.sql("SELECT 'a b c d' AS text").createOrReplaceTempView("sr_in")
    val rows = spark.sql(
      """SELECT pos, shingle FROM sr_in
        |LATERAL VIEW shingle_rows(text, 2) t AS pos, shingle
        |ORDER BY pos""".stripMargin).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((0, "a b"), (1, "b c"), (2, "c d")))
  }

  test("heavy_hitters is usable as a SQL aggregate (map of item -> estimate)") {
    GraftFunctions.install(spark)
    spark.sql("SELECT explode(array('a','a','a','b','b','c')) AS w")
      .createOrReplaceTempView("hh_in")
    val m = spark.sql("SELECT heavy_hitters(w, 8) AS hh FROM hh_in")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("hh")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 3L, "b" -> 2L, "c" -> 1L)) // under capacity => exact
  }

  test("char_ngram_rows works as a SQL table-generating function") {
    GraftFunctions.install(spark)
    spark.sql("SELECT ' AbC ' AS text").createOrReplaceTempView("cn_in")
    val rows = spark.sql(
      """SELECT gram FROM cn_in
        |LATERAL VIEW char_ngram_rows(text, 2) t AS gram""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("ab", "bc")) // trimmed + lowercased, 2-grams
  }

  test("default shingle size is 3 and type errors are caught at analysis") {
    GraftFunctions.install(spark)
    assert(spark.sql("SELECT size(shingle_hashes('a b c d')) AS n").head().getInt(0) == 2)
    val ex = intercept[Exception] { spark.sql("SELECT fnv64(42)").head() }
    assert(ex.getMessage.toLowerCase.contains("string"))
  }
}

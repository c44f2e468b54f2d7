package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink coverage: lossless roundtrips per format, partitioned layout
  * with pruning, schema enforcement. */
class SourcesSpec extends SparkSpec {

  private lazy val li = Tables.load(spark, sf, "lineitem")

  private def roundtrips(format: String): Unit =
    test(s"$format roundtrip preserves the row multiset and schema") {
      val tmp = Files.createTempDirectory(s"io-$format").toString + "/t"
      IO.write(li, tmp, format)
      val back = IO.read(spark, tmp, format,
        schema = if (format == "parquet") None else Some(li.schema))
      assert(back.schema == li.schema, back.schema.simpleString)
      assert(back.count() == li.count())
      assert(li.exceptAll(back).isEmpty && back.exceptAll(li).isEmpty)
    }

  roundtrips("parquet")
  roundtrips("csv")
  roundtrips("json")
  roundtrips("orc")

  test("partitioned write produces prunable layout (scan reads one partition dir)") {
    val tmp = Files.createTempDirectory("io-part").toString + "/t"
    IO.write(li.withColumn("flag", col("l_returnflag")), tmp,
      partitionBy = Seq("flag"))
    val one = IO.read(spark, tmp).filter(col("flag") === "R")
    val want = li.filter(col("l_returnflag") === "R").count()
    assert(one.count() == want)
    // physical check: only the flag=R directory is listed by the scan
    val scanned = one.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(!scanned.contains("flag=A"), "partition pruning failed")
  }

  test("maxRecordsPerFile bounds output file sizes") {
    val tmp = Files.createTempDirectory("io-maxrec").toString + "/t"
    IO.write(li, tmp, coalesceTo = 1, maxRecordsPerFile = 1000)
    val files = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    assert(files.size >= (li.count() / 1000).toInt,
      s"expected multiple bounded files, got ${files.size}")
  }

  test("enforced schema fails fast on a missing required column") {
    val tmp = Files.createTempDirectory("io-schema").toString + "/t"
    IO.write(li.select("l_orderkey"), tmp, "csv")
    val back = IO.read(spark, tmp, "csv", Some(li.schema),
      options = Map("mode" -> "FAILFAST"))
    intercept[Exception] { back.collect() }
  }

  test("CloudConf mirrors the reference client config and applies to a session") {
    val s = CloudConf.settings()
    // boto3 Config analog (reference parquet-splitter.py:38-43)
    assert(s("spark.hadoop.fs.s3a.attempts.maximum") == "10")
    assert(s("spark.hadoop.fs.s3a.connection.maximum") == "64")
    assert(s("spark.hadoop.fs.s3a.connection.establish.timeout") == "10000")
    assert(s("spark.hadoop.fs.s3a.connection.timeout") == "120000")
    // zero-rename committer + idempotent partition overwrite
    assert(s("spark.hadoop.fs.s3a.committer.name") == "magic")
    assert(s("spark.sql.sources.partitionOverwriteMode") == "dynamic")

    // applyTo on an isolated session: SQL conf lands in THAT session only,
    // hadoop keys land in the shared hadoopConfiguration. The committer
    // class bindings are excluded here — this local JVM has no
    // spark-hadoop-cloud module, and binding them would break every write
    // in the session (exactly why CloudConf is explicit opt-in).
    val s2 = spark.newSession()
    CloudConf.applyTo(s2, s - "spark.sql.sources.commitProtocolClass"
      - "spark.sql.parquet.output.committer.class")
    assert(s2.conf.get("spark.sql.sources.partitionOverwriteMode") == "dynamic")
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic",
      "the original session must be unaffected")
    assert(s2.sparkContext.hadoopConfiguration
      .get("fs.s3a.committer.name") == "magic")
  }
}

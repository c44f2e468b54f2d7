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
}

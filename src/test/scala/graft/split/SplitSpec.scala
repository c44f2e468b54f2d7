package graft.split

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Reference-parity tests against the golden corpus at
  * /root/reference/sample-data (read-only). See SURVEY.md §5. */
class SplitSpec extends SparkSpec {

  private val golden = "/root/reference/sample-data/data"

  private def freshJob(tmp: String) = new SplitJob(spark,
    SplitConfig("test", s"$golden/input", s"$tmp/output", s"$tmp/markers"))

  test("PathOps stems + prefix normalization handle reference edge cases") {
    assert(PathOps.normalizePrefix("a/b///") == "a/b/")
    assert(PathOps.normalizePrefix("a/b") == "a/b/")
    assert(PathOps.stemsWithSuffix(
      Seq("p/20251107.parquet", "p/x.json", "p/sub/20250101.parquet", "p/foo.parquet"),
      ".parquet") == Set("20251107", "20250101", "foo"))
  }

  test("Marker serializes to the reference JSON shape") {
    val m = Marker("pyshell", "20251107", "in/20251107.parquet",
      Seq("out/a/20251107.parquet"), "2025-11-22T03:25:16Z")
    val js = m.toJson
    assert(js.contains("\"kind\": \"pyshell\""))
    assert(js.contains("\"output_count\": 1"))
    assert(js.contains("\"generated_at\": \"2025-11-22T03:25:16Z\""))
  }

  test("golden corpus: full run splits 3 dates x 30 keys and matches golden outputs") {
    val tmp = Files.createTempDirectory("split-golden").toString
    val summary = freshJob(tmp).run()

    assert(summary.missingDates == Seq("20251107", "20251114", "20251121"))
    assert(summary.processedDates == Seq("20251107", "20251114", "20251121"))

    // 30 keys per date, marker per date
    for (date <- Seq("20251107", "20251114", "20251121")) {
      assert(Files.exists(Paths.get(s"$tmp/markers/$date.json")))
      val markerJson = new String(Files.readAllBytes(Paths.get(s"$tmp/markers/$date.json")))
      assert(markerJson.contains("\"output_count\": 30"), markerJson.take(200))
    }

    // row-set equality vs every checked-in golden output
    for (item <- Seq("0000000001", "0000000002", "0000000003");
         date <- Seq("20251107", "20251114", "20251121")) {
      val got = spark.read.parquet(s"$tmp/output/$item/$date.parquet")
      val want = spark.read.parquet(s"$golden/output/$item/$date.parquet")
      assert(got.count() == want.count(), s"$item/$date row count")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"$item/$date row multiset mismatch")
    }
  }

  test("ledger: second run is a no-op; deleting one marker reprocesses exactly that date") {
    val tmp = Files.createTempDirectory("split-ledger").toString
    freshJob(tmp).run()
    val second = freshJob(tmp).run()
    assert(second.missingDates.isEmpty && second.processedDates.isEmpty)

    Files.delete(Paths.get(s"$tmp/markers/20251114.json"))
    val third = freshJob(tmp).run()
    assert(third.processedDates == Seq("20251114"))
  }

  test("quirk parity: null keys dropped and counted; empty input never commits a marker") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("split-quirks").toString
    Seq(("2025/01/01", "0000000001", 5L, "0001"),
        ("2025/01/01", null.asInstanceOf[String], 7L, "0002"))
      .toDF("date", "item_id", "sales_figures", "store_id")
      .coalesce(1).write.parquet(s"$tmp/in_nulls/20250101.parquet")
    spark.emptyDataset[(String, String, Long, String)]
      .toDF("date", "item_id", "sales_figures", "store_id")
      .coalesce(1).write.parquet(s"$tmp/in_empty/20250102.parquet")

    val splitter = new Splitter(spark)
    splitter.splitOne(s"$tmp/in_nulls/20250101.parquet", s"$tmp/out", "20250101") match {
      case SplitOutcome.Written(outputs, keys, dropped) =>
        assert(keys == 1L && dropped == 1L, s"keys=$keys dropped=$dropped")
        assert(outputs.size == 1 &&
          outputs.head.endsWith("/out/0000000001/20250101.parquet"), outputs)
      case other => fail(s"unexpected $other")
    }
    assert(splitter.splitOne(s"$tmp/in_empty/20250102.parquet", s"$tmp/out", "20250102")
      == SplitOutcome.EmptyInput)
    assert(splitter.splitOne(s"$tmp/in_missing/20250103.parquet", s"$tmp/out", "20250103")
      == SplitOutcome.MissingInput)
  }

  test("quirk parity: missing item_id column is job-fatal") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("split-nocol").toString
    Seq(("2025/01/01", 5L)).toDF("date", "sales_figures")
      .write.parquet(s"$tmp/in/20250101.parquet")
    val ex = intercept[IllegalArgumentException] {
      new Splitter(spark).splitOne(s"$tmp/in/20250101.parquet", s"$tmp/out", "20250101")
    }
    assert(ex.getMessage.contains("item_id"))
  }

  test("preserveOrder mode reproduces the golden files' exact row order") {
    val tmp = Files.createTempDirectory("split-order").toString
    val splitter = new Splitter(spark, preserveOrder = true)
    splitter.splitOne(s"$golden/input/20251107.parquet", s"$tmp/out", "20251107")
    for (item <- Seq("0000000001", "0000000002", "0000000003")) {
      val got = spark.read.parquet(s"$tmp/out/$item/20251107.parquet")
        .collect().map(_.toSeq).toSeq
      val want = spark.read.parquet(s"$golden/output/$item/20251107.parquet")
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"row ORDER differs from golden for $item")
    }
  }

  test("split preserves the row multiset (union of outputs == input minus null keys)") {
    val tmp = Files.createTempDirectory("split-multiset").toString
    freshJob(tmp).run()
    val in = spark.read.parquet(s"$golden/input/20251107.parquet")
      .filter(col("item_id").isNotNull)
    val out = spark.read.parquet(s"$tmp/output/*/20251107.parquet")
    assert(out.count() == in.count())
    assert(in.exceptAll(out).isEmpty && out.exceptAll(in).isEmpty)
  }
}

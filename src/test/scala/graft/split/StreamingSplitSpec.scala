package graft.split

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The streaming split variant must produce the same outputs+markers as the
  * batch ledger path, with checkpoint-based incrementality. */
class StreamingSplitSpec extends SparkSpec {

  private val golden = "/root/reference/sample-data/data"

  test("streaming split over the golden corpus matches batch outputs; checkpoint makes rerun a no-op") {
    val tmp = Files.createTempDirectory("stream-split").toString
    val cfg = SplitConfig("stream", s"$golden/input", s"$tmp/output", s"$tmp/markers")
    val job = new StreamingSplitJob(spark, cfg, s"$tmp/ckpt")

    val processed = job.run()
    assert(processed == Seq("20251107", "20251114", "20251121"))
    for (date <- processed)
      assert(Files.exists(Paths.get(s"$tmp/markers/$date.json")))

    // outputs equal the golden files
    for (item <- Seq("0000000001", "0000000002", "0000000003");
         date <- processed) {
      val got = spark.read.parquet(s"$tmp/output/$item/$date.parquet")
      val want = spark.read.parquet(s"$golden/output/$item/$date.parquet")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"$item/$date mismatch")
    }

    // second run: checkpoint says everything is consumed
    val again = new StreamingSplitJob(spark, cfg, s"$tmp/ckpt").run()
    assert(again.isEmpty, s"expected no-op rerun, got $again")
  }

  test("streaming honors preserveOrder: golden files' exact row order") {
    val tmp = Files.createTempDirectory("stream-split-order").toString
    val cfg = SplitConfig("stream", s"$golden/input", s"$tmp/output",
      s"$tmp/markers", preserveOrder = true)
    new StreamingSplitJob(spark, cfg, s"$tmp/ckpt").run()
    for (item <- Seq("0000000001", "0000000002", "0000000003")) {
      val got = spark.read.parquet(s"$tmp/output/$item/20251107.parquet")
        .collect().map(_.toSeq).toSeq
      val want = spark.read.parquet(s"$golden/output/$item/20251107.parquet")
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"row ORDER differs from golden for $item (streaming)")
    }
  }
}

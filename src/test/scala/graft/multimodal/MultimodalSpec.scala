package graft.multimodal

import graft.{SparkSpec, Tables}
import graft.functions.Fnv64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  test("payload column is binary and byte-faithful to the source text") {
    val m = Multimodal.withPayload(Tables.load(spark, sf, "documents"))
    assert(m.schema("payload").dataType == BinaryType)
    val r = m.orderBy("media_id").head()
    val doc = Tables.load(spark, sf, "documents").orderBy("doc_id").head()
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("payload"),
      doc.getAs[String]("text").getBytes("UTF-8")))
  }

  test("extractMeta: one metadata row per input, fingerprint matches payload bytes") {
    implicit val s = spark
    val docs = Tables.load(spark, sf, "documents")
    val meta = Multimodal.extractMeta(Multimodal.withPayload(docs)).cache()
    assert(meta.count() == docs.count())
    // content_fp must equal the Fnv64 of the text bytes (decode saw the real payload)
    val viaExpr = docs.select(col("doc_id").as("media_id"),
      Fnv64.fnv64(col("text")).as("fp_expr"))
    val joined = meta.toDF().join(viaExpr, "media_id")
      .filter(col("content_fp") =!= col("fp_expr"))
    assert(joined.count() == 0)
  }

  test("sampleFrames: stride-5 coverage of every payload's frame range, deterministic fps") {
    implicit val s = spark
    val m = Multimodal.withPayload(Tables.load(spark, sf, "documents"))
    val frames = Multimodal.sampleFrames(m, everyNth = 5).toDF().cache()
    val meta = Multimodal.extractMeta(m).toDF()
    // per media: frame count == ceil(n_frames / 5), indices are 0,5,10,…
    val counts = frames.groupBy("media_id").agg(
      count(lit(1)).as("sampled"), max("frame_idx").as("maxi"))
    val bad = counts.join(meta, "media_id")
      .filter(col("sampled") =!= ceil(col("n_frames").cast("double") / 5.0) ||
        col("maxi") % 5 =!= 0 || col("maxi") >= col("n_frames"))
    assert(bad.count() == 0)
    // frame 0's fingerprint is the payload fp folded with idx 0 bytes — spot check
    val f0 = frames.filter(col("frame_idx") === 0).orderBy("media_id").head()
    val p0 = m.orderBy("media_id").head().getAs[Array[Byte]]("payload")
    assert(f0.getAs[Long]("frame_fp") ==
      Multimodal.StubDecoder.frameFp(Fnv64.hash(p0), 0L))
  }

  test("batching does not change results (batch size 1 vs 1000)") {
    implicit val s = spark
    val m = Multimodal.withPayload(Tables.load(spark, sf, "documents"))
    val a = Multimodal.extractMeta(m, batchSize = 1).toDF()
    val b = Multimodal.extractMeta(m, batchSize = 1000).toDF()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}

package graft.multimodal

import graft.{SparkSpec, Tables}
import graft.functions.Fnv64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  test("payload is a real GIF87a container: header, dims, text in comment") {
    val m = Multimodal.withPayload(Tables.load(spark, sf, "documents"))
    assert(m.schema("payload").dataType == BinaryType)
    val r = m.orderBy("media_id").head()
    val doc = Tables.load(spark, sf, "documents").orderBy("doc_id").head()
    val payload = r.getAs[Array[Byte]]("payload")
    val text = doc.getAs[String]("text").getBytes("UTF-8")
    assert(new String(payload.take(6), "US-ASCII") == "GIF87a")
    val (w, h, frames) = Multimodal.GifCodec.parse(payload)
    assert(w == text.length % 640 + 1 && h == text.length % 480 + 1)
    assert(frames.length == text.length % 30 + 1)
    // the comment extension carries the text bytes: first sub-block starts
    // at offset 16 (13 header/LSD + 0x21 0xFE + length byte)
    val chunk = math.min(255, text.length)
    assert(java.util.Arrays.equals(payload.slice(16, 16 + chunk),
      text.take(chunk)))
  }

  test("codec round-trip: parse(encode(...)) recovers dims, frame count, frame bytes") {
    for (n <- Seq(0, 1, 254, 255, 256, 511, 600)) {
      val text = Array.tabulate(n)(i => (i % 251).toByte)
      val p = Multimodal.GifCodec.encode(text, 17, 23, 4)
      val (w, h, frames) = Multimodal.GifCodec.parse(p)
      assert(w == 17 && h == 23 && frames.length == 4, s"n=$n")
      frames.zipWithIndex.foreach { case (f, i) =>
        val expect = Array.tabulate(8)(s => ((i.toLong >>> (s * 8)) & 0xffL).toByte)
        assert(java.util.Arrays.equals(f, expect), s"frame $i of n=$n")
      }
    }
  }

  test("extractMeta: one row per input, parsed fields, fingerprint of the container bytes") {
    implicit val s = spark
    val docs = Tables.load(spark, sf, "documents")
    val m = Multimodal.withPayload(docs)
    val meta = Multimodal.extractMeta(m).cache()
    assert(meta.count() == docs.count())
    // content_fp must equal the Fnv64 of the CONTAINER bytes (decode saw
    // the real payload), and n_bytes the container size
    import spark.implicits._
    val viaBytes = m.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) => (id, p.length.toLong, Fnv64.hash(p)) }
      .toDF("media_id", "len_direct", "fp_direct")
    val bad = meta.toDF().join(viaBytes, "media_id")
      .filter(col("content_fp") =!= col("fp_direct") ||
        col("n_bytes") =!= col("len_direct"))
    assert(bad.count() == 0)
  }

  test("sampleFrames: stride-5 coverage of every payload's frame range, parsed fps") {
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
    // frame 0's fingerprint folds its parsed data sub-block (idx 0 LE64 =
    // eight zero bytes) onto the container hash — spot check
    val f0 = frames.filter(col("frame_idx") === 0).orderBy("media_id").head()
    val p0 = m.orderBy("media_id").head().getAs[Array[Byte]]("payload")
    assert(f0.getAs[Long]("frame_fp") ==
      Multimodal.GifCodec.fold(Fnv64.hash(p0), new Array[Byte](8)))
  }

  test("batching does not change results (batch size 1 vs 1000)") {
    implicit val s = spark
    val m = Multimodal.withPayload(Tables.load(spark, sf, "documents"))
    val a = Multimodal.extractMeta(m, batchSize = 1).toDF()
    val b = Multimodal.extractMeta(m, batchSize = 1000).toDF()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}

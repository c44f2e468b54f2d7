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

  test("codec round-trip: parse(encode(...)) recovers dims, frame count, decoded pixels") {
    for (n <- Seq(0, 1, 254, 255, 256, 511, 600)) {
      val text = Array.tabulate(n)(i => (i % 251).toByte)
      val p = Multimodal.GifCodec.encode(text, 17, 23, 4)
      val (w, h, frames) = Multimodal.GifCodec.parse(p)
      assert(w == 17 && h == 23 && frames.length == 4, s"n=$n")
      frames.zipWithIndex.foreach { case (f, i) =>
        val expect = Array.tabulate(8)(j => (8 * i + j).toByte)
        assert(java.util.Arrays.equals(f, expect), s"frame $i of n=$n")
      }
    }
  }

  test("LZW round-trip: literals, zero runs, KwKwK, code widening past 9 bits") {
    import Multimodal.GifCodec.{lzwDecode, lzwEncode}
    def rt(bytes: Array[Byte], min: Int = 8): Unit = {
      val enc = lzwEncode(bytes, min)
      assert(java.util.Arrays.equals(lzwDecode(enc, min), bytes),
        s"round-trip failed for ${bytes.length} bytes at min=$min")
    }
    rt(Array.emptyByteArray)                       // clear + EOI only
    rt(Array.tabulate(8)(j => (8 * 3 + j).toByte)) // the frame-strip shape
    rt(new Array[Byte](64))                        // all-zero run → KwKwK codes
    rt(Array.fill(1000)(7.toByte))                 // long single-byte run
    // deterministic LCG stream long enough to push the table past 512
    // entries (codes widen 9 → 10 bits) — and at min=2, past several widths
    var s = 12345L
    val noisy = Array.tabulate(4000) { _ =>
      s = (s * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffffffffffL
      (s >>> 16).toByte
    }
    rt(noisy)
    rt(noisy.map(b => (b & 3).toByte), min = 2)    // 4-symbol alphabet
    // the frame strip's compressed form is the closed-form 12 bytes the
    // oracle replays: clear, 8 literal codes, EOI at 9 bits LSB-first
    val i = 5
    val strip = lzwEncode(Array.tabulate(8)(j => (8 * i + j).toByte), 8)
    assert(strip.length == 12)
    val codes = Seq(256) ++ (0 to 7).map(8 * i + _) ++ Seq(257)
    val bits = codes.zipWithIndex.map { case (c, k) => BigInt(c) << (9 * k) }.sum
    val expect = Array.tabulate(12)(b => ((bits >> (8 * b)) & 0xff).toByte)
    assert(java.util.Arrays.equals(strip, expect))
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
    // frame 0's fingerprint folds its DECODED 8×1 pixel strip (bytes
    // 0..7 for frame index 0) onto the container hash — spot check
    val f0 = frames.filter(col("frame_idx") === 0).orderBy("media_id").head()
    val p0 = m.orderBy("media_id").head().getAs[Array[Byte]]("payload")
    assert(f0.getAs[Long]("frame_fp") ==
      Multimodal.GifCodec.fold(Fnv64.hash(p0), Array.tabulate(8)(_.toByte)))
  }

  test("batching does not change results (batch size 1 vs 1000)") {
    implicit val s = spark
    val m = Multimodal.withPayload(Tables.load(spark, sf, "documents"))
    val a = Multimodal.extractMeta(m, batchSize = 1).toDF()
    val b = Multimodal.extractMeta(m, batchSize = 1000).toDF()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("content payload round-trips: decoded frame pixels are the text bytes cycled") {
    implicit val s = spark
    import s.implicits._
    // "aaaa…" exercises the LZW dictionary + KwKwK decode path end-to-end
    val docs = Seq((1L, "a" * 40), (2L, "the quick brown fox jumps"), (3L, ""))
      .toDF("doc_id", "text")
    Multimodal.withContentPayload(docs).as[Multimodal.MediaRecord].collect()
      .foreach { r =>
        val text = docs.filter(col("doc_id") === r.media_id)
          .head().getString(1).getBytes("UTF-8")
        val n = text.length
        val (_, _, frames) = Multimodal.GifCodec.parse(r.payload)
        assert(frames.length == n % 30 + 1)
        frames.zipWithIndex.foreach { case (f, i) =>
          val expect = Array.tabulate(8)(j =>
            if (n == 0) 0.toByte else text((8 * i + j) % n))
          assert(java.util.Arrays.equals(f, expect),
            s"media ${r.media_id} frame $i")
        }
      }
  }

  test("rankHash: brightness-monotone invariance, diagonal never set, distance tracks content") {
    val px = Array[Byte](10, 50, 30, 90, 20, 70, 40, 60)
    val h = Multimodal.rankHash(px)
    // any monotone brightness remap (here 2x+5, staying in unsigned range)
    // leaves every pairwise rank — and so the hash — unchanged
    val remapped = px.map(b => (2 * (b & 0xff) + 5).toByte)
    assert(Multimodal.rankHash(remapped) == h)
    (0 until 8).foreach(j => assert(((h >>> (8 * j + j)) & 1L) == 0L))
    assert(h >= 0)
    // swapping two ADJACENT-rank pixels (60 and 70 — no other value in
    // between) flips exactly the 2 bits comparing them: small perceptual
    // change -> small Hamming distance
    val swapped = px.clone(); swapped(5) = 60; swapped(7) = 70
    assert(java.lang.Long.bitCount(h ^ Multimodal.rankHash(swapped)) == 2)
  }

  test("resizeFrames: 2x box filter of decoded pixels with floor semantics") {
    implicit val s = spark
    import s.implicits._
    // n=2 -> 3 frames, every strip cycles 'a','b' (97,98): each output
    // pixel = floor((97+98)/2) = 97 — pins the floor, not round-half-up
    val out = Multimodal.resizeFrames(
        Multimodal.withContentPayload(Seq((1L, "ab")).toDF("doc_id", "text")))
      .collect().sortBy(_.frame_idx)
    assert(out.length == 3)
    out.foreach { f =>
      assert((f.r0, f.r1, f.r2, f.r3) == ((97L, 97L, 97L, 97L)))
    }
  }

  test("frameDedup: exact clones collapse to the first owner, distant frames all kept") {
    implicit val s = spark
    import s.implicits._
    // docs 1 and 2 share text -> every frame pair (same idx) is an exact
    // phash clone; doc 3 is unrelated content
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "0123456789 ~~~ ZZZZ qqqq ### wxyz !!")
    ).toDF("doc_id", "text")
    val out = Multimodal.frameDedup(Multimodal.withContentPayload(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3))))
      .toMap
    val byFrame = out.groupBy(_._1._1)
    // same text -> same byte length -> same frame count and equal hashes
    val f1 = out.filter(_._1._1 == 1L)
    val f2 = out.filter(_._1._2 == 2L)
    f1.foreach { case ((_, idx), (ph, keep)) =>
      val (ph2, keep2) = out((2L, idx))
      assert(ph2 == ph)
      // doc 1 owns the canonical copy unless an earlier doc-1 frame
      // already claimed the same/near hash; doc 2's clone NEVER keeps
      assert(!keep2, s"frame $idx of doc 2 should be dropped")
    }
    // at least one doc-1 frame survives as a canonical representative
    assert(out.exists { case ((m, _), (_, keep)) => m == 1L && keep })
    // plan shape: banded self-join only — no cartesian anywhere
    val plan = Multimodal.frameDedup(Multimodal.withContentPayload(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}

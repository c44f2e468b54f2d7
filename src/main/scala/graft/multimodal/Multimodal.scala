package graft.multimodal

import graft.functions.Fnv64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata structs, and decode/feature-extraction runs
  * partition-wise in bounded batches (the Scala analog of a Pandas-UDF
  * `mapInPandas` pipeline: same schema contract, same batch shape, same
  * partitioning behavior).
  *
  * The payloads are REAL GIF87a containers (CompuServe GIF, public spec):
  * [[withPayload]] synthesizes one per document — logical screen descriptor
  * carrying genuine width/height, a comment extension carrying the document
  * text, and one image block per frame — and [[GifCodec.parse]] is a
  * genuine block-walking parser AND pixel decoder: dimensions come from the
  * header bytes, frame count from counting image descriptors, and each
  * frame's pixels from a real variable-width LZW decode of its data
  * sub-blocks (the spec's appendix algorithm: 9→12-bit codes packed
  * LSB-first, clear/EOI codes, KwKwK case). Frame fingerprints fold the
  * DECODED pixel bytes. No codec library is involved; the container walk
  * and the LZW stage are both implemented from the public spec.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long, content_fp: Long)
  final case class FrameSample(media_id: Long, frame_idx: Long, frame_fp: Long)
  final case class FrameHash(media_id: Long, frame_idx: Long, phash: Long)
  final case class FrameResized(media_id: Long, frame_idx: Long,
      r0: Long, r1: Long, r2: Long, r3: Long)

  /** GIF87a container read/write. Layout written by [[encode]]:
    * header "GIF87a" (6 B) · logical screen descriptor (7 B: width LE16,
    * height LE16, no global color table) · comment extension (0x21 0xFE,
    * text in 255-byte length-prefixed sub-blocks, 0x00 terminator) · per
    * frame an image block (0x2C, left/top 0, an 8×1-pixel strip, no local
    * color table, LZW-min-code byte 8, the strip's 8 pixel bytes
    * `8·frameIdx + j` LZW-COMPRESSED into length-prefixed data sub-blocks,
    * 0x00 terminator) · trailer 0x3B. The pixel bytes are strictly
    * increasing, so the LZW stream is always 10 literal codes (clear, 8
    * pixels, EOI) = 90 bits = 12 bytes — a closed form the SQL oracle
    * replays byte-for-byte. */
  object GifCodec {

    /** GIF variable-width LZW encode (spec appendix): codes start at
      * minCodeSize+1 bits and are packed LSB-first; clear = 2^min, EOI =
      * clear+1, first dynamic code clear+2; code width grows when the next
      * free code would not fit (after 2^width−2 additions), capped at 12
      * bits, after which no further entries are added (deferred clear —
      * [[lzwDecode]] mirrors it). */
    def lzwEncode(pixels: Array[Byte], minCodeSize: Int): Array[Byte] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val out = new java.io.ByteArrayOutputStream(pixels.length + 16)
      var cur = 0L
      var nbits = 0
      var codeSize = minCodeSize + 1
      var nextCode = eoi + 1
      def emit(code: Int): Unit = {
        cur |= code.toLong << nbits
        nbits += codeSize
        while (nbits >= 8) { out.write((cur & 0xff).toInt); cur >>>= 8; nbits -= 8 }
        // widen AFTER packing: the decoder adds its mirror entry one code
        // later, so the first wider code on both sides is code 2^width
        if (nextCode > (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
      }
      val dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
      emit(clear)
      var prev = -1
      var i = 0
      while (i < pixels.length) {
        val k = pixels(i) & 0xff
        if (prev < 0) prev = k
        else dict.get((prev, k)) match {
          case Some(c) => prev = c
          case None =>
            emit(prev)
            if (nextCode < 4096) { dict((prev, k)) = nextCode; nextCode += 1 }
            prev = k
        }
        i += 1
      }
      if (prev >= 0) emit(prev)
      emit(eoi)
      if (nbits > 0) out.write((cur & 0xff).toInt)
      out.toByteArray
    }

    /** GIF variable-width LZW decode — the exact mirror of [[lzwEncode]],
      * including the KwKwK case (a code one past the table references the
      * just-emitted string plus its own first byte). */
    def lzwDecode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
      val clear = 1 << minCodeSize
      val eoi = clear + 1
      val out = new java.io.ByteArrayOutputStream(data.length * 2 + 16)
      def freshTable() = {
        val t = scala.collection.mutable.ArrayBuffer.tabulate(eoi + 1)(i =>
          if (i < clear) Array((i & 0xff).toByte) else Array.emptyByteArray)
        t
      }
      var table = freshTable()
      var codeSize = minCodeSize + 1
      var cur = 0L
      var nbits = 0
      var pos = 0
      def read(): Int = {
        while (nbits < codeSize && pos < data.length) {
          cur |= (data(pos) & 0xffL) << nbits; pos += 1; nbits += 8
        }
        if (nbits < codeSize) -1
        else {
          val c = (cur & ((1L << codeSize) - 1)).toInt
          cur >>>= codeSize; nbits -= codeSize; c
        }
      }
      var prev: Array[Byte] = null
      var done = false
      while (!done) {
        val code = read()
        require(code >= 0, "truncated LZW stream")
        if (code == clear) {
          table = freshTable(); codeSize = minCodeSize + 1; prev = null
        } else if (code == eoi) done = true
        else {
          val entry =
            if (code < table.length) table(code)
            else {
              require(code == table.length && prev != null,
                s"LZW code $code out of range (table ${table.length})")
              prev :+ prev(0) // KwKwK
            }
          out.write(entry, 0, entry.length)
          if (prev != null && table.length < 4096) {
            table += (prev :+ entry(0))
            if (table.length == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = entry
        }
      }
      out.toByteArray
    }

    def encode(text: Array[Byte], width: Int, height: Int,
        nFrames: Int): Array[Byte] =
      encodeWith(text, width, height,
        IndexedSeq.tabulate(nFrames)(i => Array.tabulate(8)(j => (8 * i + j).toByte)))

    /** Same container layout as [[encode]], but with CALLER-SUPPLIED 8×1
      * pixel strips — arbitrary byte content, really LZW-compressed (the
      * dictionary/KwKwK paths get exercised the moment content repeats,
      * unlike [[encode]]'s strictly-increasing strips whose stream is
      * always 10 literal codes). */
    def encodeWith(text: Array[Byte], width: Int, height: Int,
        frames: IndexedSeq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(text.length + 64)
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("GIF87a".getBytes("US-ASCII"))
      le16(width); le16(height)
      out.write(0x00); out.write(0x00); out.write(0x00) // no GCT, bg, aspect
      out.write(0x21); out.write(0xfe) // comment extension introducer
      var off = 0
      while (off < text.length) {
        val len = math.min(255, text.length - off)
        out.write(len); out.write(text, off, len); off += len
      }
      out.write(0x00) // comment terminator
      frames.foreach { pixels =>
        out.write(0x2c) // image separator
        le16(0); le16(0); le16(pixels.length); le16(1) // one pixel row
        out.write(0x00) // no local color table
        out.write(0x08) // LZW minimum code size
        val lzw = lzwEncode(pixels, 8)
        var off2 = 0
        while (off2 < lzw.length) {
          val len = math.min(255, lzw.length - off2)
          out.write(len); out.write(lzw, off2, len); off2 += len
        }
        out.write(0x00) // image data terminator
      }
      out.write(0x3b) // trailer
      out.toByteArray
    }

    /** Genuine container parse AND pixel decode: magic check, dimensions
      * from the logical screen descriptor, then a block walk — extensions
      * skipped by their length-prefixed sub-blocks, image descriptors
      * counted, their data sub-blocks collected and LZW-DECODED to pixel
      * bytes (local/global color tables honored even though [[encode]]
      * never writes one). Returned frames are decoded pixels. */
    def parse(p: Array[Byte]): (Int, Int, IndexedSeq[Array[Byte]]) = {
      require(p.length >= 14 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F',
        "not a GIF container")
      def u16(at: Int): Int = (p(at) & 0xff) | ((p(at + 1) & 0xff) << 8)
      val w = u16(6)
      val h = u16(8)
      var pos = 13
      if ((p(10) & 0x80) != 0) pos += 3 * (1 << ((p(10) & 7) + 1))
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      var done = false
      while (!done) {
        (p(pos) & 0xff) match {
          case 0x3b => done = true
          case 0x21 => // extension: label byte, then sub-blocks
            pos += 2
            while (p(pos) != 0) pos += (p(pos) & 0xff) + 1
            pos += 1
          case 0x2c => // image descriptor
            val flags = p(pos + 9) & 0xff
            pos += 10
            if ((flags & 0x80) != 0) pos += 3 * (1 << ((flags & 7) + 1))
            val minCodeSize = p(pos) & 0xff
            pos += 1
            val data = new java.io.ByteArrayOutputStream()
            while (p(pos) != 0) {
              val len = p(pos) & 0xff
              data.write(p, pos + 1, len)
              pos += len + 1
            }
            pos += 1
            frames += lzwDecode(data.toByteArray, minCodeSize)
          case b => throw new IllegalArgumentException(
            f"unknown GIF block 0x$b%02x at offset $pos")
        }
      }
      (w, h, frames.result())
    }

    /** Continue an FNV-1a state over more bytes: frame fingerprints fold
      * the frame's DECODED pixel bytes onto the container hash. */
    def fold(h0: Long, bytes: Array[Byte]): Long = {
      var h = h0
      var i = 0
      while (i < bytes.length) {
        h = (h ^ (bytes(i) & 0xffL)) * Fnv64.Prime
        i += 1
      }
      h
    }
  }

  /** Attach a binary payload column: a synthesized GIF87a container per
    * document — width/height/frame-count derived from the text's byte
    * length (n%640+1, n%480+1, n%30+1: the deterministic arithmetic the
    * oracle replays), text bytes riding in the comment extension so the
    * content fingerprint covers the document content. */
  def withPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .map { case (id, t) =>
        MediaRecord(id, GifCodec.encode(t,
          t.length % 640 + 1, t.length % 480 + 1, t.length % 30 + 1))
      }
      .toDF()
  }

  /** Decode metadata partition-wise in bounded batches. Batching bounds peak
    * memory per task exactly like a Pandas-UDF batch size would; each batch
    * is materialized, decoded, and released before the next. Width/height
    * are read from the container header, the frame count by walking the
    * image blocks — a real parse, not derived metadata. */
  def extractMeta(media: DataFrame, batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val (w, h, frames) = GifCodec.parse(r.payload)
          MediaMeta(r.media_id, r.payload.length.toLong, w.toLong, h.toLong,
            frames.length.toLong, Fnv64.hash(r.payload))
        }
      }
    }
  }

  /** Like [[withPayload]], but the frame pixel strips are CONTENT-DERIVED:
    * frame i's 8 pixels are the document's text bytes at positions
    * (8·i+j) mod n (all zeros for an empty document) — so documents with
    * equal or near-equal text produce equal or near-equal FRAMES, which is
    * what gives the perceptual-hash dedup ([[frameDedup]]) something real
    * to find. Unlike [[withPayload]]'s strictly-increasing strips, these
    * streams exercise the encoder's dictionary and KwKwK paths whenever
    * the text repeats; the parser LZW-decodes them back on read. */
  def withContentPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("t"))
      .as[(Long, Array[Byte])]
      .map { case (id, t) =>
        val n = t.length
        val frames = IndexedSeq.tabulate(n % 30 + 1)(i =>
          Array.tabulate(8)(j => if (n == 0) 0.toByte else t((8 * i + j) % n)))
        MediaRecord(id, GifCodec.encodeWith(t, n % 640 + 1, n % 480 + 1, frames))
      }
      .toDF()
  }

  /** 64-bit rank-matrix perceptual hash of an 8-pixel strip: bit 8·j+k is
    * set iff pixel j is strictly brighter than pixel k. The 8×1 adaptation
    * of aHash/dHash — dHash's neighbour comparisons are the k=j+1 diagonal
    * and aHash's mean threshold is majority-approximated by a pixel's row
    * popcount — and like both it is invariant under any monotone brightness
    * remap, the property that makes rank-order hashes perceptual rather
    * than cryptographic. Diagonal bits (j=k) are never set, so the hash is
    * always non-negative as a signed long. */
  def rankHash(px: Array[Byte]): Long = {
    val m = math.min(px.length, 8)
    var h = 0L
    var j = 0
    while (j < m) {
      var k = 0
      while (k < m) {
        if ((px(j) & 0xff) > (px(k) & 0xff)) h |= 1L << (8 * j + k)
        k += 1
      }
      j += 1
    }
    h
  }

  /** Decode every frame of every payload and emit its perceptual hash —
    * same bounded-batch partition-wise shape as [[extractMeta]]. */
  def framePerceptualHashes(media: DataFrame, batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[FrameHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val (_, _, frames) = GifCodec.parse(r.payload)
          frames.iterator.zipWithIndex.map { case (px, i) =>
            FrameHash(r.media_id, i.toLong, rankHash(px))
          }
        }
      }
    }
  }

  /** Decode + RESIZE: box-filter each decoded 8×1 strip down 2× to four
    * pixels (each output = floor of the mean of its two source pixels —
    * integer arithmetic, so the oracle replays it exactly). The image
    * feature-extraction shape every multimodal pipeline runs after
    * decode (thumbnail/patch preparation); same bounded-batch
    * partition-wise contract as [[extractMeta]]. Emitted as four scalar
    * columns (fixed-width rows beat array columns for a 100 TB feature
    * table, and the driver's hash compare is scalar-typed). */
  def resizeFrames(media: DataFrame, batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[FrameResized] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val (_, _, frames) = GifCodec.parse(r.payload)
          frames.iterator.zipWithIndex.map { case (px, i) =>
            def avg(j: Int): Long =
              (((px(2 * j) & 0xff) + (px(2 * j + 1) & 0xff)) / 2).toLong
            FrameResized(r.media_id, i.toLong, avg(0), avg(1), avg(2), avg(3))
          }
        }
      }
    }
  }

  /** Frame-level perceptual-hash image dedup — the operator a multimodal
    * training pipeline runs over every decoded image/frame: keep one
    * canonical frame per perceptual cluster, drop the rest. Two levels,
    * both clique-proof at 100 TB:
    *
    *  1. EXACT collapse: frames group by their 64-bit [[rankHash]]; the
    *     group's canonical frame is its minimum (media_id, frame_idx).
    *     Identical-content cliques (the overwhelming bulk of real image
    *     dup mass) collapse to ONE node each before any pairing happens —
    *     the candidate stream below is quadratic only in DISTINCT hashes.
    *  2. BANDED Hamming near-dup over the distinct hashes: 4 bands ×
    *     16 bits (the [[graft.operators.Dedup.simhashPairs]] machinery);
    *     by pigeonhole any two hashes within Hamming distance
    *     `maxHamming` ≤ 3 share at least one full band, so recall is
    *     exactly 1 and the oracle can replay the rule without knowing the
    *     banding. A distinct hash is dropped iff some hash within
    *     `maxHamming` ranks before it (greedy-by-rank — deterministic
    *     without a transitive closure).
    *
    * Output one row per frame, totally ordered:
    * (media_id, frame_idx, phash, keep). */
  def frameDedup(media: DataFrame, maxHamming: Int = 3, batchSize: Int = 64)
      (implicit spark: SparkSession): DataFrame = {
    require(maxHamming <= 3, "4 bands x 16 bits only guarantees recall up to Hamming 3")
    val fh = framePerceptualHashes(media, batchSize).toDF()
    // first-owner rank as a lexicographic struct — NOT a packed
    // media_id*64+frame_idx long, which silently collides across media
    // once a container carries >= 64 frames (struct min/compare is
    // correct for arbitrary frame counts and costs the same)
    val ranked = fh.withColumn("rank",
      struct(col("media_id"), col("frame_idx")))
    val groups = ranked.groupBy(col("phash"))
      .agg(min(col("rank")).as("grank"))
    val bands = groups.select(col("phash"), col("grank"), posexplode(
        array((0 until 4).map(b =>
          shiftright(col("phash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
      .as(Seq("band", "bh")))
      // one exchange feeds both sides of the self-join (the minhashLsh /
      // simhashPairs reuse rationale)
      .hint("shuffle_hash")
    val dropped = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("y.grank") < col("x.grank") &&
          bit_count(col("x.phash").bitwiseXOR(col("y.phash"))) <= maxHamming)
      .select(col("x.phash")).distinct()
      .withColumn("is_dropped", lit(true))
    ranked
      .join(groups, "phash")
      .join(dropped, Seq("phash"), "left")
      .select(col("media_id"), col("frame_idx"), col("phash"),
        (col("rank") === col("grank") && col("is_dropped").isNull).as("keep"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Sample every `everyNth` frame of each payload: one row per sampled
    * frame, fingerprint = the container's FNV state folded over that
    * frame's LZW-DECODED pixel bytes. The fan-out happens executor-side
    * inside the same bounded-batch iteration as extractMeta — the
    * video-frame-sampling shape (parse container → decode frames → emit
    * per-frame features). */
  def sampleFrames(media: DataFrame, everyNth: Int = 5, batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val (_, _, frames) = GifCodec.parse(r.payload)
          // hash the container ONCE; each frame folds only its parsed bytes
          val h0 = Fnv64.hash(r.payload)
          Iterator.range(0, frames.length, everyNth).map(i =>
            FrameSample(r.media_id, i.toLong, GifCodec.fold(h0, frames(i))))
        }
      }
    }
  }
}

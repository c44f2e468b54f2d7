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
  * DECODE IS A STUB: this container has no image/audio codecs, so
  * [[StubDecoder.decode]] derives deterministic fake dimensions from the
  * payload bytes. The Spark-side plumbing — binary schema, batched
  * partition iteration, metadata struct output — is real and tested; swap
  * `StubDecoder` for a codec-backed implementation to productionize.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long, content_fp: Long)
  final case class FrameSample(media_id: Long, frame_idx: Long, frame_fp: Long)

  /** STUB decode: deterministic fake metadata from payload bytes.
    * A real decoder would parse container headers here. */
  object StubDecoder {
    def decode(r: MediaRecord): MediaMeta = {
      val n = r.payload.length.toLong
      MediaMeta(
        media_id = r.media_id,
        n_bytes = n,
        width = n % 640 + 1,
        height = n % 480 + 1,
        n_frames = n % 30 + 1,
        content_fp = Fnv64.hash(r.payload))
    }

    /** STUB frame fingerprint: the payload's FNV-1a state (`payloadHash`,
      * computed ONCE per record) continued over the 8 little-endian bytes
      * of the frame index (a real decoder would hash the decoded frame's
      * pixels). Deterministic and byte-replayable by the DuckDB oracle. */
    def frameFp(payloadHash: Long, idx: Long): Long = {
      var h = payloadHash
      var s = 0
      while (s < 8) {
        h = (h ^ ((idx >>> (s * 8)) & 0xffL)) * Fnv64.Prime
        s += 1
      }
      h
    }
  }

  /** Attach a binary payload column. For the testdata (no real media) the
    * payload is the UTF-8 encoding of `text` — opaque bytes as far as the
    * pipeline is concerned. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Decode metadata partition-wise in bounded batches. Batching bounds peak
    * memory per task exactly like a Pandas-UDF batch size would; each batch
    * is materialized, decoded, and released before the next. */
  def extractMeta(media: DataFrame, batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch => batch.map(StubDecoder.decode) }
    }
  }

  /** Sample every `everyNth` frame of each payload: one row per sampled
    * frame with a deterministic frame fingerprint. The fan-out happens
    * executor-side inside the same bounded-batch iteration as extractMeta —
    * the video-frame-sampling shape (decode container → iterate frames →
    * emit per-frame features) with the codec stubbed. */
  def sampleFrames(media: DataFrame, everyNth: Int = 5, batchSize: Int = 64)
      (implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          // hash the payload ONCE; each frame folds only its 8 index bytes
          val h0 = Fnv64.hash(r.payload)
          val nFrames = r.payload.length.toLong % 30 + 1
          (0L until nFrames by everyNth.toLong).map(i =>
            FrameSample(r.media_id, i, StubDecoder.frameFp(h0, i)))
        }
      }
    }
  }
}

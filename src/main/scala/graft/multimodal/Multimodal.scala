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
}

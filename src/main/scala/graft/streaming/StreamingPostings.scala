package graft.streaming

import graft.operators.IncrementalPostings
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming dual of incremental index maintenance
  * ([[graft.operators.IncrementalPostings]], q120): each micro-batch
  * tokenizes its own documents and appends their (term, doc_id, tf) rows
  * to the persistent store under the micro-batch's partition — the
  * streaming arrival of the ingestion dates the batch operator models.
  * tf rows are additive state, so the store's report equals the
  * from-scratch [[graft.operators.Search.postings]] over everything that
  * has streamed in (pinned in StreamingSpec).
  *
  * foreachBatch for the usual reason (the store is the PRODUCT, it lives
  * in the storage layer), and retry idempotence comes from the store's
  * contract: a replayed micro-batch overwrites its own `ds=` partition
  * (dynamic partition overwrite) instead of double-counting. */
object StreamingPostings {

  /** Attach the indexing sink to a streaming Dataset of documents (must
    * carry `doc_id` and `text`). */
  def run(docs: DataFrame, store: String, checkpoint: String,
      availableNow: Boolean = false): StreamingQuery = {
    val w = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        IncrementalPostings.appendCounts(batch, store, s"b$id")
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The takedown SUPPRESSION FEED on the streaming ingestion path — the
  * q183 guarantee ("forgotten stays forgotten") extended to the duals:
  * a re-crawled document arriving through a STREAM would re-enter the
  * stores exactly like a re-delivered batch date, so every ingestion
  * dual's `run(...)` accepts an optional per-batch `suppress` transform
  * and this is the canonical one to pass.
  *
  * The feed is read AT BATCH TIME (inside foreachBatch), deliberately:
  * a takedown batch that commits while the stream is running takes
  * effect from the very next micro-batch. A static anti-join planned at
  * stream start would freeze the request-file list it unioned — new
  * batches would be invisible until restart (and that staleness would
  * be silent, the failure mode this engine refuses on principle).
  * Cost per micro-batch: one marker listing plus an anti-join against
  * the takedown-history ids — list×batch-sized, never store-sized.
  *
  * NOTE this suppresses INGESTION of ids already taken down; ids taken
  * down AFTER being ingested are [[StreamingTombstones]]' job. A
  * pipeline runs both: the tombstone stream erases history, the
  * suppression feed keeps it erased. */
object Suppression {

  /** Anti-join one micro-batch against every committed takedown batch's
    * ids ([[graft.operators.TakedownJob.appliedIds]] over the same
    * request catalog + marker ledger the batch [[graft.operators
    * .TakedownJob]] runs on). Pass as
    * `suppress = Some(Suppression.filterBatch(_, reqDir, markerDir))`
    * to any streaming ingestion dual. */
  def filterBatch(batch: DataFrame, requestDir: String, markerDir: String,
      idCol: String = "doc_id"): DataFrame =
    graft.operators.TakedownJob
      .appliedIds(batch.sparkSession, requestDir, markerDir)
      .fold(batch) { sup =>
        batch.join(sup.select(col(sup.columns.head).as(idCol)),
          Seq(idCol), "left_anti")
      }
}

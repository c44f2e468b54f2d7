package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert semantics on plain parquet-backed DataFrames — the
  * `MERGE INTO` of transactional table formats (Delta/Iceberg/Hudi),
  * expressed as one declarative plan: matched keys take the change row's
  * values (SCD type-1 overwrite), unmatched change rows insert, unmatched
  * base rows carry forward.
  *
  * Scale shape: a single full-outer shuffle join on the key — exactly the
  * join MERGE INTO executes underneath — with per-column coalesce; no
  * windows, no driver state. For a changes side much smaller than base,
  * the planner (AQE) converts its shuffle to broadcast; for repeated
  * daily merges at 100 TB, bucket both sides by the key to make the join
  * exchange-free (see sources.BucketingSpec).
  */
object Merge {

  /** Upsert `changes` into `base` (same schema both sides): per-column
    * `coalesce(change, base)` over a full-outer join on `keyCols`.
    *
    * Column-level contract: a change row REPLACES the whole base row
    * (type-1), except columns where the change carries null — those fall
    * back to the base value (partial-update friendly; pass complete rows
    * for strict replacement semantics). */
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(base.columns.toSeq == changes.columns.toSeq,
      s"upsert needs identical schemas, got ${base.columns.toSeq} vs ${changes.columns.toSeq}")
    val b = base.as("b")
    val c = changes.as("c")
    val cond = keyCols.map(k => col(s"b.$k") === col(s"c.$k")).reduce(_ && _)
    val projected = base.columns.toSeq.map(cn =>
      coalesce(col(s"c.$cn"), col(s"b.$cn")).as(cn))
    b.join(c, cond, "full_outer").select(projected: _*)
  }
}

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
    * for strict replacement semantics).
    *
    * Key-uniqueness contract: like MERGE INTO, a key may appear at most
    * once in `changes` — duplicates would fan the full-outer join out
    * into duplicate primary keys. `verifyUniqueKeys` (default on) runs
    * one aggregation over the CHANGES side only (the small side of every
    * sane merge) and fails fast; disable it for very large change sets
    * whose uniqueness is guaranteed upstream. */
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      verifyUniqueKeys: Boolean = true): DataFrame = {
    require(base.columns.toSeq == changes.columns.toSeq,
      s"upsert needs identical schemas, got ${base.columns.toSeq} vs ${changes.columns.toSeq}")
    if (verifyUniqueKeys) {
      val dup = changes.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"upsert changes contain duplicate keys (e.g. ${dup.headOption.orNull}) — " +
          "MERGE semantics require at most one change row per key")
    }
    val b = base.as("b")
    val c = changes.as("c")
    val cond = keyCols.map(k => col(s"b.$k") === col(s"c.$k")).reduce(_ && _)
    val projected = base.columns.toSeq.map(cn =>
      coalesce(col(s"c.$cn"), col(s"b.$cn")).as(cn))
    b.join(c, cond, "full_outer").select(projected: _*)
  }
}

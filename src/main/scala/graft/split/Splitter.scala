package graft.split

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-date split result (analog of the per-date section of process_kind,
  * reference/src/Split/parquet-splitter.py:144-186). */
sealed trait SplitOutcome
object SplitOutcome {
  /** Outputs written (full paths), marker may now be committed. */
  final case class Written(outputs: Seq[String], distinctKeys: Long, droppedNullRows: Long)
      extends SplitOutcome
  /** Input object missing → warn + skip, no marker (quirk §2.2, O7). */
  case object MissingInput extends SplitOutcome
  /** Empty input → skip, NO marker — faithful to the reference's
    * empty-file livelock (parquet-splitter.py:154-156, SURVEY §2.2.4). */
  case object EmptyInput extends SplitOutcome
}

/** The split engine: read one date's parquet, validate, and write one output
  * file per distinct `keyCol` value at `outDir/{key}/{date}.parquet`
  * (reference O6–O12).
  *
  * Spark-first design notes (vs the reference's driver-RAM pandas loop):
  *  - the input is never materialized on the driver; `repartition(keyCol)`
  *    shuffles each key's rows to exactly one task, and the partitioned write
  *    fans out across executors — Spark tasks replace the thread pool (O12);
  *  - a failed task fails the Spark action, which aborts the date BEFORE its
  *    marker is written — same commit semantics as the reference's
  *    as_completed + raise (parquet-splitter.py:169-171);
  *  - null keys are dropped explicitly (pandas groupby dropna quirk,
  *    SURVEY §2.2.3) and counted, instead of silently;
  *  - at 100 TB a hot key becomes one giant task; `maxRecordsPerFile` bounds
  *    file size and `repartition(N, keyCol, salt)` would bound task size —
  *    the exact single-file-per-key layout is only contractual for the
  *    reference-parity mode.
  */
/** @param preserveOrder when true, each output file keeps the input's row
  *   order within its key group (the reference's pandas-groupby semantics,
  *   SURVEY.md §2.2.2): rows are tagged with a monotonic sequence before the
  *   key shuffle and sorted within each output partition. Costs a
  *   sort-within-partition per output task; leave false when only multiset
  *   equality matters. */
final class Splitter(spark: SparkSession, keyCol: String = "item_id",
    preserveOrder: Boolean = false) {

  /** Split one date. Layout parity: writes via `partitionBy` on a duplicated
    * key column (so the data keeps `keyCol`, like the reference), then a
    * driver-side rename pass collapses `__split_key={k}/part-*.parquet` to
    * `{k}/{date}.parquet`. The rename is O(#keys) cheap FS metadata ops. */
  def splitOne(inPath: String, outDir: String, date: String): SplitOutcome = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(inPath).getFileSystem(conf)
    if (!fs.exists(new Path(inPath))) return SplitOutcome.MissingInput

    val df = spark.read.parquet(inPath)
    require(df.columns.contains(keyCol),
      s"input $inPath is missing required column '$keyCol'") // O9, job-fatal
    if (df.isEmpty) return SplitOutcome.EmptyInput // O8

    // one scan for both counts: count(keyCol) skips nulls
    val Array(total, nonNullCount) = df
      .agg(count(lit(1)), count(col(keyCol))).head().toSeq
      .map(_.asInstanceOf[Long]).toArray
    val outputs = writeGroups(df, outDir, date)
    SplitOutcome.Written(outputs.sorted, outputs.size.toLong, total - nonNullCount)
  }

  /** The keyed write path alone (no guards): one output file per distinct
    * non-null key at `outDir/{key}/{date}.parquet`. Shared by the batch
    * ledger job and the streaming variant's foreachBatch. */
  def writeGroups(df: DataFrame, outDir: String, date: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(outDir).getFileSystem(conf)
    val stagingDir = PathOps.normalizePrefix(outDir) + s"_staging_$date"
    val keyed = df.filter(col(keyCol).isNotNull)
      .withColumn("__split_key", col(keyCol))
    val arranged =
      if (preserveOrder)
        keyed.withColumn("__seq", monotonically_increasing_id())
          .repartition(col("__split_key"))
          .sortWithinPartitions(col("__split_key"), col("__seq"))
          .drop("__seq")
      else keyed.repartition(col("__split_key"))
    arranged.write
      .mode("overwrite")
      .partitionBy("__split_key")
      .parquet(stagingDir)
    promoteStaging(fs, stagingDir, outDir, date)
  }

  /** Move `_staging/{__split_key=k}/part-*.parquet` → `outDir/k/{date}.parquet`. */
  private def promoteStaging(fs: FileSystem, stagingDir: String, outDir: String,
      date: String): Seq[String] = {
    val staging = new Path(stagingDir)
    val outputs = fs.listStatus(staging).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__split_key="))
      .map { st =>
        val key = st.getPath.getName.stripPrefix("__split_key=")
        val parts = fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        require(parts.size == 1,
          s"expected exactly one part file for key $key, got ${parts.size}")
        val target = new Path(PathOps.normalizePrefix(outDir) + s"$key/$date.parquet")
        fs.mkdirs(target.getParent)
        if (fs.exists(target)) fs.delete(target, false) // idempotent overwrite (O11)
        require(fs.rename(parts.head.getPath, target), s"rename failed for $key")
        target.toString
      }
    fs.delete(staging, true)
    outputs
  }
}

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
  /** Empty input → skip; marker policy decided by the caller (SplitJob):
    * faithful mode writes NO marker — the reference's empty-file livelock
    * (parquet-splitter.py:154-156, SURVEY §2.2.4). */
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
  *  - hot keys at 100 TB: `saltBuckets > 1` spreads hot keys across tasks
  *    (hash-salted round-robin in unordered mode; range-partitioned into
  *    max(saltBuckets, shuffle partitions) contiguous chunks in ordered
  *    mode) and `maxRecordsPerFile > 0` bounds output file size; both
  *    leave reference-parity mode (exactly one `{key}/{date}.parquet` per
  *    key), so multi-part outputs are written as numbered
  *    `{key}/{date}-NNNNN.parquet` files instead (numeric part order =
  *    input order in ordered mode; N widens past 5 digits as needed).
  *
  * @param preserveOrder when true, each output file keeps the input's row
  *   order within its key group (the reference's pandas-groupby semantics,
  *   SURVEY.md §2.2.2): rows are tagged with a monotonic sequence before the
  *   key shuffle and sorted within each output partition. Costs a
  *   sort-within-partition per output task; leave false when only multiset
  *   equality matters.
  * @param maxRecordsPerFile 0 = single file per key (parity); >0 bounds rows
  *   per output file (Spark splits a task's output at the bound).
  * @param saltBuckets 1 = one task per key (parity); >1 bounds task/file
  *   size under skew. Unordered mode hash-salts each key over exactly that
  *   many tasks; ordered mode range-partitions (key, sequence) into
  *   max(saltBuckets, session shuffle partitions) total tasks so each
  *   key's files stay contiguous chunks of its input order (concatenating
  *   them in numeric part order reconstructs it).
  */
final class Splitter(spark: SparkSession, keyCol: String = "item_id",
    preserveOrder: Boolean = false, maxRecordsPerFile: Long = 0L,
    saltBuckets: Int = 1) {
  require(saltBuckets >= 1, "saltBuckets must be >= 1")

  /** Reference-parity layout contract: exactly one part file per key. */
  private def parityLayout: Boolean = maxRecordsPerFile == 0L && saltBuckets == 1

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
    val distinctKeys = outputs
      .map(p => new Path(p).getParent.getName).distinct.size.toLong
    SplitOutcome.Written(outputs.sorted, distinctKeys, total - nonNullCount)
  }

  /** The keyed write path alone (no guards): output files per distinct
    * non-null key at `outDir/{key}/{date}[-NNNNN].parquet`. Shared by the
    * batch ledger job and the streaming variant's foreachBatch. */
  def writeGroups(df: DataFrame, outDir: String, date: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(outDir).getFileSystem(conf)
    val stagingDir = PathOps.normalizePrefix(outDir) + s"_staging_$date"
    val keyed = df.filter(col(keyCol).isNotNull)
      .withColumn("__split_key", col(keyCol))
    val seqd =
      if (preserveOrder || saltBuckets > 1)
        keyed.withColumn("__seq", monotonically_increasing_id())
      else keyed
    val arranged = (preserveOrder, saltBuckets) match {
      case (true, 1) =>
        seqd.repartition(col("__split_key"))
          .sortWithinPartitions(col("__split_key"), col("__seq"))
          .drop("__seq")
      case (true, n) => // salted + ordered: a RANGE partitioner on
        // (key, __seq) keeps each key's chunks contiguous — file p's rows
        // all precede file p+1's in the input — so concatenating a key's
        // numbered files in part order reconstructs its input sequence
        // exactly (a pmod salt would round-robin rows across files and
        // lose that property). The task count is max(n, session shuffle
        // partitions) so a small saltBuckets never CAPS job parallelism —
        // the sampler gives hot keys proportionally more tasks. Note the
        // range boundaries come from sampling: WHICH rows land in which
        // file may vary run to run; the per-key concatenation order and
        // the row multiset are the invariants.
        val parts = math.max(n,
          spark.sessionState.conf.numShufflePartitions)
        seqd.repartitionByRange(parts, col("__split_key"), col("__seq"))
          .sortWithinPartitions(col("__split_key"), col("__seq"))
          .drop("__seq")
      case (false, 1) => keyed.repartition(col("__split_key"))
      case (false, n) => // salt spreads one hot key over n shuffle tasks
        seqd.repartition(col("__split_key"), pmod(col("__seq"), lit(n)))
          .drop("__seq")
    }
    val writer = arranged.write.mode("overwrite").partitionBy("__split_key")
    (if (maxRecordsPerFile > 0)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer).parquet(stagingDir)
    promoteStaging(fs, stagingDir, outDir, date)
  }

  /** Move `_staging/{__split_key=k}/part-*.parquet` into place. Parity mode
    * asserts exactly one part per key → `outDir/k/{date}.parquet`; bounded
    * modes (salt / maxRecordsPerFile) number the parts in task order →
    * `outDir/k/{date}-NNNNN.parquet` (a single part keeps the parity name,
    * so unskewed keys look identical in either mode). */
  private def promoteStaging(fs: FileSystem, stagingDir: String, outDir: String,
      date: String): Seq[String] = {
    val staging = new Path(stagingDir)
    val outputs = fs.listStatus(staging).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__split_key="))
      .flatMap { st =>
        val key = st.getPath.getName.stripPrefix("__split_key=")
        // NUMERIC sort on the part id: lexicographic name order misorders
        // ids past 99999 ("part-100000" < "part-10001"), which would break
        // the ordered-mode concatenation contract exactly in the huge-date
        // regime; same for our own emitted "-NNNNN" numbering below.
        val partId = "part-(\\d+)".r
        // the c-counter (a task's maxRecordsPerFile split index) sits right
        // before the extension: "…-c000.snappy.parquet". Anchor on the
        // trailing dot so a uuid segment that happens to start with 'c' can
        // never match.
        val cId = "-c(\\d+)\\.".r
        val parts = fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
          .sortBy { f => // (numeric task id, numeric c-counter, name): both
            // ids are NUMERIC — lexicographic order misorders either counter
            // once it widens past its zero-padding (…-c999 → …-c1000)
            val nm = f.getPath.getName
            (partId.findFirstMatchIn(nm).map(_.group(1).toLong)
              .getOrElse(Long.MaxValue),
              cId.findFirstMatchIn(nm).map(_.group(1).toLong).getOrElse(0L),
              nm)
          }
        if (parityLayout) require(parts.size == 1,
          s"expected exactly one part file for key $key, got ${parts.size}")
        val targetDir = new Path(PathOps.normalizePrefix(outDir) + key)
        fs.mkdirs(targetDir)
        // idempotent overwrite (O11): clear every prior file for this date,
        // including stale numbered parts from a previous bounded-mode run
        // with a different part count. Match ONLY this date's exact name or
        // its `-NNNNN` part numbering — a looser `{date}-*` prefix would
        // delete outputs of a DIFFERENT date whose stem merely starts with
        // this one (stems are arbitrary strings, SURVEY §2.2.5).
        // \d{5,}: part numbers are zero-padded to 5 digits but grow wider
        // past 99999 parts; the cleanup must match those too or a rerun
        // with fewer parts would leave stale wide-numbered files behind.
        val partPattern = java.util.regex.Pattern
          .compile(java.util.regex.Pattern.quote(date) + "-\\d{5,}\\.parquet")
        fs.listStatus(targetDir).toSeq.filter { f =>
          val n = f.getPath.getName
          f.isFile && (n == s"$date.parquet" || partPattern.matcher(n).matches())
        }.foreach(f => fs.delete(f.getPath, false))
        parts.zipWithIndex.map { case (part, i) =>
          val name =
            if (parts.size == 1) s"$date.parquet" else f"$date-$i%05d.parquet"
          val target = new Path(targetDir, name)
          require(fs.rename(part.getPath, target), s"rename failed for $key")
          target.toString
        }
      }
    fs.delete(staging, true)
    outputs
  }
}

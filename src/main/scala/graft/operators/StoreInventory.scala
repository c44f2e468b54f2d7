package graft.operators

import graft.split.MarkerLedger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._

/** STORE OBSERVABILITY for the orchestrated families — the "is my
  * pipeline healthy" call an operator makes before trusting a serve:
  * which ingestion dates does each family actually hold, with how many
  * rows, and is any family LAGGING (a date present in some families but
  * not all — the residue of a mid-date crash cleaned up by hand, or a
  * store mutated outside the orchestrators)? [[CurateJob]] guarantees
  * per-date all-or-nothing within a run, but stores live for years and
  * humans touch them; the inventory is the detector that keeps the
  * guarantee observable.
  *
  * Scale shape: row counts are count-only aggregates grouped by the
  * partition column — the scan reads no data columns (footer row counts
  * serve it), and the output is families × partitions rows, driver-safe
  * at any corpus size. Reads go through the families' consistent-scan
  * resolution so a crashed fold's half-published label never
  * double-counts. */
object StoreInventory {

  /** One row per (family, ds) a family's table holds:
    * `(family, ds, n_rows)`. Consolidated (`c_*`) and generation
    * (`r_*`) labels report as-is — they ARE the store's state; the
    * per-date view below them is gone by design. */
  def dates(spark: SparkSession,
      families: Seq[(String, String)]): DataFrame = {
    val present = families.filter(f => spark.catalog.tableExists(f._2))
    require(present.nonEmpty,
      s"none of the inventory tables exist: ${families.map(_._2).mkString(", ")}")
    present.map { case (fam, table) =>
      IncrementalStore.consistentScan(spark, table)
        .groupBy(col("ds")).agg(count(lit(1)).as("n_rows"))
        .select(lit(fam).as("family"), col("ds"), col("n_rows"))
    }.reduce(_ unionAll _)
  }

  /** The LAGGING-FAMILY detector: `(family, ds)` pairs where `ds` is a
    * plain ingestion date held by at least one family but missing from
    * this one. Empty = every family holds the same date set (the
    * [[CurateJob]] invariant). Fold-aware, so maintenance never reads
    * as lag: dates at or before a family's `c_*` horizon are judged
    * present (they live under the consolidated label), and a family
    * holding any `r_*` generation label is skipped outright — a gen
    * rewrite folds EVERYTHING, so which absent dates predate it is
    * unknowable from partitions alone (keyed on the CURATION LEDGER,
    * [[missingVsLedger]] stays sharp through gen rewrites). A family
    * whose table does not EXIST reports one explicit `(family,
    * "(absent)")` row instead of reading as fully-lagging — the same
    * families [[dates]] omits, surfaced rather than smeared across
    * every date (ADVICE r17: the two views must agree on whether a
    * family exists). Driver-side metadata only (families × dates
    * strings — the ledger scale shape). */
  def missing(spark: SparkSession,
      families: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val (present, absent) =
      families.partition(f => spark.catalog.tableExists(f._2))
    val parts: Seq[(String, Seq[String])] = present.map { case (fam, t) =>
      fam -> spark.sql(s"SHOW PARTITIONS $t").collect()
        .map(_.getString(0).stripPrefix("ds=")).toSeq
    }
    val plain = parts.flatMap { case (f, ps) =>
      ps.filter(p => !p.startsWith("c_") && !p.startsWith("r_"))
        .map(f -> _)
    }.toSet
    val allDates = plain.map(_._2).toSeq.distinct.sorted
    val pairs = for {
      (f, ps) <- parts if !ps.exists(_.startsWith("r_"))
      horizon = ps.filter(_.startsWith("c_"))
        .map(_.stripPrefix("c_")).maxOption
      d <- allDates
      if horizon.forall(d > _) && !plain.contains(f -> d)
    } yield (f, d)
    (absent.map(_._1 -> "(absent)") ++ pairs).toDF("family", "ds")
  }

  /** The lagging-family detector KEYED ON THE CURATION LEDGER — sharp
    * where [[missing]] goes blind: the expected-date set is
    * [[CurateJob]]'s committed markers (the pipeline's own record of
    * what landed), not the union of whatever partitions the families
    * still hold, so a gen-rewritten family (`r_*` labels — takedown,
    * refit, hot-cell split) is judged instead of skipped. Per family,
    * a committed date is PRESENT iff it is held as a plain partition,
    * sits at or under the family's `c_*` fold horizon, or committed
    * BEFORE the family's newest COMPLETED gen rewrite (the `r_*`
    * partition's newest file modification time vs marker commit
    * times — sound because store mutations are lease-excluded, so
    * "marker older than the rewrite's files" means "partitions existed
    * when the rewrite folded them"; an r_* label with a live
    * `_fold_pending_*` sentinel and NO `_compact_*_done` commit marker
    * is a crashed, uncommitted rewrite and earns no fold credit — but
    * sentinel WITH the commit marker is a fold that crashed between
    * commit and cleanup, credited, both matching
    * [[IncrementalStore.consistentScan]]'s resolution exactly. Dates
    * [[CurateJob]] flagged `{date}.empty` (all-suppressed re-crawls)
    * landed no partition anywhere by construction and are skipped.
    * Reported rows are therefore exactly "store mutated OUTSIDE the
    * orchestrator" — a fold that consumed the date never fires. A
    * family whose table does not exist reports `(family, "(absent)")`
    * (the [[missing]] convention). Driver-side metadata only: one
    * marker-dir listing + per-family partition listings. */
  def missingVsLedger(spark: SparkSession, families: Seq[(String, String)],
      markerDir: String): DataFrame = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val ledger = new MarkerLedger(hconf)
    // dates whose post-suppression slice was EMPTY landed no partition
    // anywhere by construction ([[CurateJob]]'s `{date}.empty` flag) —
    // expected-absent, not lagging
    val empty = ledger.listStemsFlat(markerDir, ".empty")
    val committed = ledger.doneTimesFlat(markerDir)
      .toSeq.filterNot(kv => empty.contains(kv._1)).sortBy(_._1)
    val rows = families.flatMap { case (fam, t) =>
      if (!spark.catalog.tableExists(t)) Seq(fam -> "(absent)")
      else {
        val ps = spark.sql(s"SHOW PARTITIONS $t").collect()
          .map(_.getString(0).stripPrefix("ds=")).toSeq
        val plain = ps.filterNot(p =>
          p.startsWith("c_") || p.startsWith("r_")).toSet
        val horizon = ps.filter(_.startsWith("c_"))
          .map(_.stripPrefix("c_")).maxOption
        val root = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog
            .getTableMetadata(TableIdentifier(t)).location)
        val fs = root.getFileSystem(hconf)
        val foldedAt = ps.filter(_.startsWith("r_")).flatMap { lbl =>
          // a live sentinel means crashed MID-fold — unless the commit
          // marker also exists (crash landed between commit and the
          // epilogue's cleanup), in which case the fold IS committed,
          // exactly as consistentScan resolves it: credit it, or every
          // pre-rewrite date mass-false-alarms while serves read fine
          val pending = fs.exists(new org.apache.hadoop.fs.Path(root,
            s"_fold_pending_$lbl")) &&
            !fs.exists(new org.apache.hadoop.fs.Path(root,
              s"_compact_${lbl}_done"))
          if (pending) None
          else {
            // fold time = the label's newest FILE mtime (dir mtimes are
            // synthetic on object stores); one bounded partition listing
            val dir = new org.apache.hadoop.fs.Path(root, s"ds=$lbl")
            if (!fs.exists(dir)) None
            else (fs.getFileStatus(dir).getModificationTime +:
              fs.listStatus(dir).map(_.getModificationTime).toSeq)
              .maxOption
          }
        }.maxOption
        committed.collect {
          case (d, committedAt)
              if !plain.contains(d) && !horizon.exists(d <= _) &&
                !foldedAt.exists(committedAt < _) => fam -> d
        }
      }
    }
    rows.toDF("family", "ds")
  }
}

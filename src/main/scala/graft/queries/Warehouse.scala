package graft.queries

import org.apache.spark.sql.SparkSession

/** Hygiene for the pid-named bucketed store tables (q92 / q128 / q133).
  *
  * Those queries persist per-process tables named
  * `graft_q<NNN>_p<pid>_<dirhash>[_suffix]` in the shared warehouse dir.
  * The in-memory catalog dies with its process but the warehouse
  * directory persists, so a crashed run leaks a full bucketed store on
  * disk under a DEAD pid that per-name `DROP TABLE` can never reach.
  *
  * The sweep deletes ONLY directories whose embedded pid is no longer
  * alive: a concurrent live process (a bench next to a verify run, the
  * round-9 race) keeps its stores untouched, while every crash leftover
  * is reclaimed by whichever process runs next. A name that does not
  * parse as `..._p<pid>_...` is never touched — unknown provenance is
  * not ours to delete.
  */
object Warehouse {

  private val PidName = """graft_q\d+_p(\d+)_.*""".r

  /** True iff `name` embeds a pid that is provably not alive. Parse
    * failures and live pids (this process included) are NOT orphans.
    *
    * LIMITS of the pid test — it answers "is a process with this number
    * alive on THIS host right now", which differs from "does the store's
    * owner still exist" in two ways:
    *  - pid recycling: a dead owner's pid can be reused by an unrelated
    *    process, making a genuinely dead store look alive. The error is
    *    conservative (the store leaks until the recycled pid also exits;
    *    nothing live is ever deleted), so it only delays reclamation.
    *  - shared-filesystem warehouses: a store written by ANOTHER host
    *    embeds that host's pid, which is meaningless here — a local
    *    process may coincidentally hold the number forever. For that
    *    deployment pass `maxAgeHours` to [[sweepOrphans]]: a store whose
    *    directory mtime is older than the threshold is reclaimed
    *    regardless of pid (age is host-independent; every live graft
    *    store is written and dropped within one query call, so hours of
    *    stillness means an owner that is gone). */
  private[graft] def isOrphan(name: String): Boolean = name match {
    case PidName(pidStr) =>
      pidStr.toLongOption.exists { pid =>
        val h = ProcessHandle.of(pid)
        !h.isPresent || !h.get.isAlive
      }
    case _ => false
  }

  /** Delete every warehouse directory starting with `prefix` whose
    * embedded pid is dead — or, when `maxAgeHours` is set, whose mtime is
    * older than the threshold even if its pid reads alive (the
    * shared-warehouse / recycled-pid fallback; see [[isOrphan]]'s limits).
    * Safe to call concurrently from any number of processes: live stores
    * are never candidates (with an age threshold, "live" additionally
    * means "written within the last `maxAgeHours`" — size it far above
    * any single query's runtime; the name must still parse as a graft
    * store either way). */
  def sweepOrphans(s: SparkSession, prefix: String,
      maxAgeHours: Option[Double] = None): Unit = {
    val whRoot = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val fs = whRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    val cutoff = maxAgeHours.map(h =>
      System.currentTimeMillis() - (h * 3600 * 1000).toLong)
    def tooOld(st: org.apache.hadoop.fs.FileStatus): Boolean =
      cutoff.exists(st.getModificationTime < _) &&
        PidName.pattern.matcher(st.getPath.getName).matches()
    if (fs.exists(whRoot))
      fs.listStatus(whRoot)
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith(prefix) && (isOrphan(n) || tooOld(st))
        }
        .foreach(st => fs.delete(st.getPath, true))
  }

  // /tmp store names come in two shapes: graft_q<NNN>_p<pid>_<hash> (the
  // q145 convention) and graft_q<NNN>_<pid>_<hash>[_<nonce>] (q91/q109/
  // q148/q149)
  private val TmpPidName = """graft_q\d+_p?(\d+)_.*""".r

  private[graft] def isTmpOrphan(name: String): Boolean = name match {
    case TmpPidName(pidStr) =>
      pidStr.toLongOption.exists { pid =>
        val h = ProcessHandle.of(pid)
        !h.isPresent || !h.get.isAlive
      }
    case _ => false
  }

  /** [[sweepOrphans]] for the per-process PATH stores under /tmp (the
    * q91/q109/q145/q148/q149 store dirs): delete every `prefix`-named
    * directory whose embedded pid is dead. Each query already cleans its
    * OWN slate (and the q148/q149 nonce names are delete-on-exit), but a
    * crashed FOREIGN run's directories would otherwise leak until
    * reboot — the warehouse sweep's gap for path stores. `java.io.File`
    * deliberately: /tmp is host-local by definition, unlike the store
    * paths themselves (the readOrEmpty lesson does not apply). Live pids
    * and unparseable names are never touched. */
  def sweepTmpOrphans(prefix: String, tmpDir: String = "/tmp"): Unit = {
    def rmrf(x: java.io.File): Unit = {
      if (x.isDirectory)
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      x.delete(); ()
    }
    Option(new java.io.File(tmpDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) && isTmpOrphan(f.getName))
      .foreach(rmrf)
  }
}

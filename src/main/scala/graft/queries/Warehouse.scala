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
    * failures and live pids (this process included) are NOT orphans. */
  private[graft] def isOrphan(name: String): Boolean = name match {
    case PidName(pidStr) =>
      pidStr.toLongOption.exists { pid =>
        val h = ProcessHandle.of(pid)
        !h.isPresent || !h.get.isAlive
      }
    case _ => false
  }

  /** Delete every warehouse directory starting with `prefix` whose
    * embedded pid is dead. Safe to call concurrently from any number of
    * processes: live stores are never candidates. */
  def sweepOrphans(s: SparkSession, prefix: String): Unit = {
    val whRoot = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val fs = whRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(whRoot))
      fs.listStatus(whRoot)
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith(prefix) && isOrphan(n)
        }
        .foreach(st => fs.delete(st.getPath, true))
  }
}

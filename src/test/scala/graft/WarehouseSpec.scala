package graft

import graft.queries.Warehouse
import org.apache.hadoop.fs.Path

class WarehouseSpec extends SparkSpec {

  test("orphan detection: dead pid yes, live pid no, unparseable no") {
    val live = ProcessHandle.current().pid()
    // a pid beyond any plausible pid_max (2^22 on Linux by default):
    // ProcessHandle.of returns empty → provably not alive
    val dead = 1L << 40
    assert(Warehouse.isOrphan(s"graft_q128_p${dead}_abc"))
    assert(!Warehouse.isOrphan(s"graft_q128_p${live}_abc"),
      "a live process's store must never be classified orphan")
    assert(!Warehouse.isOrphan("graft_q128_pnotanumber_abc"))
    assert(!Warehouse.isOrphan("somebody_elses_table"))
    assert(Warehouse.isOrphan(s"graft_q133_p${dead}_abc_codes"),
      "suffixed store names (q133's _codes/_cells) must parse too")
  }

  test("sweepOrphans deletes only dead-pid stores under the prefix") {
    val whRoot = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = whRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = ProcessHandle.current().pid()
    val dead = 1L << 40
    val liveDir = new Path(whRoot, s"graft_q900_p${live}_test")
    val deadDir = new Path(whRoot, s"graft_q900_p${dead}_test")
    val otherDir = new Path(whRoot, s"graft_q901_p${dead}_test")
    try {
      Seq(liveDir, deadDir, otherDir).foreach(fs.mkdirs)
      Warehouse.sweepOrphans(spark, "graft_q900_p")
      assert(fs.exists(liveDir),
        "concurrent live store swept — the round-9 race is back")
      assert(!fs.exists(deadDir), "dead-pid orphan must be reclaimed")
      assert(fs.exists(otherDir), "sweep must stay inside its prefix")
    } finally
      Seq(liveDir, deadDir, otherDir).foreach(p => fs.delete(p, true))
  }

  test("age-threshold fallback reclaims stale live-pid stores, spares fresh ones") {
    val whRoot = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = whRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = ProcessHandle.current().pid()
    // both embed a LIVE pid (the recycled-pid / foreign-host shape: the
    // pid test alone would spare them forever)
    val stale = new Path(whRoot, s"graft_q902_p${live}_stale")
    val fresh = new Path(whRoot, s"graft_q902_p${live}_fresh")
    val unparseable = new Path(whRoot, s"graft_q902_notapid")
    try {
      Seq(stale, fresh, unparseable).foreach(fs.mkdirs)
      val dayAgo = System.currentTimeMillis() - 24 * 3600 * 1000L
      fs.setTimes(stale, dayAgo, dayAgo)
      fs.setTimes(unparseable, dayAgo, dayAgo)
      Warehouse.sweepOrphans(spark, "graft_q902_", maxAgeHours = Some(1.0))
      assert(!fs.exists(stale),
        "a live-pid store older than the age threshold must be reclaimed")
      assert(fs.exists(fresh),
        "a fresh live-pid store must survive an age-threshold sweep")
      assert(fs.exists(unparseable),
        "age fallback must still require a parseable graft store name")
      // without a threshold the same stale live-pid store is untouched
      Warehouse.sweepOrphans(spark, "graft_q902_")
      assert(fs.exists(fresh) && fs.exists(unparseable))
    } finally
      Seq(stale, fresh, unparseable).foreach(p => fs.delete(p, true))
  }

  test("tmp path-store sweep reclaims dead-pid dirs in both name shapes, spares live/unparseable") {
    val tmp = java.nio.file.Files.createTempDirectory("sweeptmp").toFile
    val proc = new ProcessBuilder("true").start()
    proc.waitFor()
    val dead = proc.pid()
    val live = ProcessHandle.current().pid()
    val deadPlain = new java.io.File(tmp, s"graft_q903_${dead}_abc12")
    val deadP = new java.io.File(tmp, s"graft_q903_p${dead}_abc12")
    val liveDir = new java.io.File(tmp, s"graft_q903_${live}_abc12_ff1")
    val alien = new java.io.File(tmp, "graft_q903_notapid")
    try {
      Seq(deadPlain, deadP, liveDir, alien).foreach(_.mkdirs())
      // nested content must go too (the stores are directory trees)
      new java.io.File(deadPlain, "sigstore/ds=d0").mkdirs()
      Warehouse.sweepTmpOrphans("graft_q903_", tmp.toString)
      assert(!deadPlain.exists() && !deadP.exists(),
        "dead-pid stores (both name shapes) must be reclaimed")
      assert(liveDir.exists(), "a live pid's store must survive")
      assert(alien.exists(), "unparseable names are not ours to delete")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(tmp)
    }
  }
}

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
}

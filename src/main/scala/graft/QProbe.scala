package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query probe: run one registered query against an SF dir
  * and print its row count — the cheap way to check a query's behavior at a
  * scale factor without paying a full Verify pass over the whole registry
  * (e.g. banded-candidate recall at sf0.1). Usage:
  * `runMain graft.QProbe /root/testdata/sf0.1 q130_source_overlap_minhash` */
object QProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: QProbe <sfDir> <queryName>")
    val dir = args(0); val name = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("QPROBE rows=" + SparkEntry.queries(name)(spark, dir).count())
    spark.stop()
  }
}

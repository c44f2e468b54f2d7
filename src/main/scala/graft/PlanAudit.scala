package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected queries so the
  * plan shape (pushdown, broadcasts, exchange count, codegen spans) can be
  * reviewed and iterated. Usage: runMain graft.PlanAudit [names...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n======== $n ========")
      val df = SparkEntry.queries(n)(spark, dir)
      df.explain("formatted")
      val plan = df.queryExecution.executedPlan.toString
      val nExch = "Exchange".r.findAllIn(plan).size
      val nScan = "Scan parquet".r.findAllIn(plan).size
      println(s"[audit] $n: exchanges=$nExch parquetScans=$nScan " +
        s"broadcasts=${"BroadcastExchange".r.findAllIn(plan).size}")
    }
    spark.stop()
  }
}

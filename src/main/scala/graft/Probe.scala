package graft

import org.apache.spark.sql.SparkSession

/** Dev-only sanity probe: read every testdata table and print schema+count. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      try {
        val df = Tables.load(spark, dir, n)
        println(s"== $n: rows=${df.count()} schema=${df.schema.simpleString}")
      } catch { case e: Throwable => println(s"== $n FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}

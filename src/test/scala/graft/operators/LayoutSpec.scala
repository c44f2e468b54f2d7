package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits: known vectors") {
    import spark.implicits._
    // z(1,0)=1, z(0,1)=2, z(3,3)=15, z(65535,0)=0x55555555
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (65535L, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 15L, 0x55555555L))
  }

  test("zOrderBy: every write partition covers a bounded (x, y) rectangle") {
    val li = Tables.load(spark, sf, "lineitem")
    val parts = Layout.zOrderBy(li, "l_partkey", "l_suppkey", 8)
      .select(col("l_partkey"), col("l_suppkey"),
        spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg(min("l_partkey").as("x0"), max("l_partkey").as("x1"),
        min("l_suppkey").as("y0"), max("l_suppkey").as("y1"),
        count(lit(1)).as("n"))
      .collect()
    assert(parts.length > 1, "expected multiple z-range partitions")
    val g = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head
    val globalArea = (g.getLong(1) - g.getLong(0) + 1).toDouble *
      (g.getLong(3) - g.getLong(2) + 1)
    // a z-range covers at most ~a quadrant-chain: every partition's
    // bounding rectangle must be well under the full key grid — that
    // bounded min/max box is exactly what file-stat pruning consumes
    parts.foreach { r =>
      val area = (r.getLong(2) - r.getLong(1) + 1).toDouble *
        (r.getLong(4) - r.getLong(3) + 1)
      assert(area <= globalArea * 0.6,
        s"partition ${r.getInt(0)} rectangle covers $area of $globalArea — no locality")
    }
  }
}

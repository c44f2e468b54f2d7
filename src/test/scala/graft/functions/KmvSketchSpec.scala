package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {

  test("KMV estimate within theoretical error of exact distinct (multi-partition merge)") {
    import spark.implicits._
    // 10k distinct values spread over 8 partitions → partial buffers MUST merge
    val df = spark.range(0, 50000).repartition(8)
      .select((col("id") % 10000).as("v"))
    val k = 256
    val est = df.agg(KmvDistinct.kmvDistinct(col("v"), k).as("e")).head().getLong(0)
    val exact = 10000.0
    val relErr = math.abs(est - exact) / exact
    // 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(relErr < 4.0 / math.sqrt(k - 2.0), s"estimate $est vs $exact (err $relErr)")
  }

  test("below k the sketch is exact; nulls are ignored") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("b"), Some("a"), None, Some("c")).toDF("v")
    val est = df.agg(KmvDistinct.kmvDistinct(col("v"), 64).as("e")).head().getLong(0)
    assert(est == 3L)
  }

  test("grouped sketches agree with exact counts at small cardinality") {
    val li = Tables.load(spark, sf, "lineitem")
    val res = li.groupBy(col("l_returnflag"))
      .agg(KmvDistinct.kmvDistinct(col("l_suppkey"), 512).as("kmv"),
        countDistinct(col("l_suppkey")).as("exact"))
    // suppkey cardinality (10 at sf0.001) is far below k → exact
    assert(res.filter(col("kmv") =!= col("exact")).count() == 0)
  }
}

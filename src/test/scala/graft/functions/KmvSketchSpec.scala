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

  test("serialize/deserialize round-trip preserves buffer contents and threshold") {
    val agg = KmvDistinct(org.apache.spark.sql.graftbridge.Bridge
      .expression(col("x")), 8)
    val a = new KmvBuffer(8)
    (1L to 100L).foreach(i => a.add(i * 0x9e3779b97f4a7c15L))
    val b = agg.deserialize(agg.serialize(a))
    assert(b.mins.equals(a.mins) && b.estimate == a.estimate)
    // post-deserialize adds must keep evicting correctly (cached threshold)
    val c = agg.deserialize(agg.serialize(a))
    (101L to 200L).foreach { i => a.add(i * 0x9e3779b97f4a7c15L); c.add(i * 0x9e3779b97f4a7c15L) }
    assert(c.mins.equals(a.mins) && c.estimate == a.estimate)
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

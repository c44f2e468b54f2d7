package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {

  test("TopK.perKey equals the window row_number formulation") {
    val o = Tables.load(spark, sf, "orders")
    val got = TopK.perKey(o,
      keyCols = Seq("o_custkey"),
      order = Seq("o_orderdate" -> false, "o_orderkey" -> false),
      k = 3)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val want = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("plan shape: partial top-k runs BEFORE the exchange, final after") {
    val o = Tables.load(spark, sf, "orders")
    val df = TopK.perKey(o, Seq("o_custkey"), Seq("o_totalprice" -> false), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopKPerKey"), plan)
    assert(plan.contains("PartialTopKPerKey"), plan)
    val iFinal = plan.indexOf("FinalTopKPerKey")
    val iExch = plan.indexOf("Exchange")
    val iPartial = plan.indexOf("PartialTopKPerKey")
    assert(iFinal < iExch && iExch < iPartial,
      s"expected Final -> Exchange -> Partial layering:\n$plan")
  }

  test("k larger than group size returns whole groups; k=1 returns per-key max") {
    import spark.implicits._
    val d = Seq((1L, 10.0), (1L, 30.0), (1L, 20.0), (2L, 5.0))
      .toDF("k", "v")
    val all = TopK.perKey(d, Seq("k"), Seq("v" -> false), 10)
    assert(all.count() == 4)
    val top1 = TopK.perKey(d, Seq("k"), Seq("v" -> false), 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top1 == Map(1L -> 30.0, 2L -> 5.0))
  }
}

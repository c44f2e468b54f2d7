package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows (inner)") {
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders")
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey", nSalts = 4)
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join keeps unmatched large-side rows exactly once") {
    import spark.implicits._
    val large = Seq((1L, "a"), (2L, "b"), (99L, "nomatch")).toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k2", "w")
    val res = Skew.saltedJoin(large, small, "k", "k2", nSalts = 4, joinType = "left")
    assert(res.count() == 3)
    assert(res.filter(col("k") === 99L && col("w").isNull).count() == 1)
  }

  test("unsupported join types are rejected") {
    import spark.implicits._
    val d = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(d, d.withColumnRenamed("k", "k2"), "k", "k2", 2, "full_outer")
    }
  }
}

package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  private lazy val lineitem = Tables.load(spark, sf, "lineitem")
  private lazy val urgent = Tables.load(spark, sf, "orders")
    .filter(col("o_orderpriority") === "1-URGENT")

  test("bloom-filtered semi-join output equals the plain semi-join") {
    val bloomed = BloomJoin.semiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, fpp = 0.03)
    val plain = lineitem.join(urgent,
      lineitem("l_orderkey") === urgent("o_orderkey"), "left_semi")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("probe side is pre-filtered by a codegen'd might_contain before the join") {
    val bloomed = BloomJoin.semiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, fpp = 0.03)
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom filter in plan:\n$plan")
    // the bloom must prune most of the probe side before the exchange:
    // urgent orders are ~20% of orders, so a 3% fpp keeps ≲25% of lineitem
    val kept = lineitem.filter(org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          { val bos = new java.io.ByteArrayOutputStream()
            urgent.stat.bloomFilter("o_orderkey", 10000L, 0.03).writeTo(bos)
            bos.toByteArray },
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graftbridge.Bridge.expression(col("l_orderkey"))))).count()
    val total = lineitem.count()
    assert(kept < total * 0.4, s"bloom kept $kept of $total probe rows")
  }

  test("string keys route through xxhash64 and equal the plain semi-join") {
    // regression: the long-only path inserted UTF8 bytes on the build side
    // but probed with mightContainLong → silent false negatives on strings
    val nation = Tables.load(spark, sf, "nation")
    // key on a STRING column: nation name joined against a derived build set
    val build = nation.select(col("n_name").as("k")).limit(5)
    val probe = nation.select(col("n_name"), col("n_nationkey"))
    val bloomed = BloomJoin.semiJoin(probe, build, "n_name", "k",
      expectedItems = 100L, fpp = 0.03)
    val plain = probe.join(build, probe("n_name") === build("k"), "left_semi")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty,
      "string-keyed bloom semi-join must be bit-identical to the plain semi-join")
  }

  test("mismatched non-integral key types fail at plan time, not silently") {
    val nation = Tables.load(spark, sf, "nation")
    val build = nation.select(col("n_nationkey").cast("string").as("k"))
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(nation, build, "n_nationkey", "k", 100L, 0.03)
    }
  }

  test("false positives are removed: bloom result never exceeds exact matches") {
    // tiny filter (high fpp) to force false positives through the bloom
    val bloomed = BloomJoin.semiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 100L, fpp = 0.2)
    val plain = lineitem.join(urgent,
      lineitem("l_orderkey") === urgent("o_orderkey"), "left_semi")
    assert(bloomed.count() == plain.count())
  }
}

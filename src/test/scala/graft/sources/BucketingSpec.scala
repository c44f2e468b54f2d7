package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-path evidence: bucketed tables co-locate join keys at write time,
  * so the big fact⋈fact join runs with NO shuffle exchange — the strategy
  * that makes repeated 100 TB joins affordable. */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key plans without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    Tables.load(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bkt")
    Tables.load(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bkt")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      // the join itself must be shuffle-free; only the final small agg shuffles
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(shuffles <= 1, s"join should not shuffle bucketed inputs:\n$plan")
      // and it still computes the right answer
      val viaPlain = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(viaPlain).isEmpty && viaPlain.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}

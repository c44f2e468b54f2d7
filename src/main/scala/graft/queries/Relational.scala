package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators over the TPC-H-ish testdata, each expressed
  * Spark-first (declarative DataFrame plans, so Catalyst gets pushdown,
  * pruning, join selection and AQE for free).
  *
  * Oracle-parity conventions (the driver hash-compares these against DuckDB
  * on identical parquet inputs):
  *  - money/ratio aggregates are summed in DECIMAL (exact, order-independent)
  *    and cast to DOUBLE at the end — a raw double sum would be
  *    partition-order dependent and nondeterministic across engines;
  *  - counts are BIGINT in both engines;
  *  - no raw TIMESTAMP columns in outputs (cast to DATE or formatted STRING)
  *    to dodge tz-annotation differences in written parquet;
  *  - every result has a total ORDER BY, mirrored in the oracle SQL.
  */
object Relational {

  private def dec(c: Column, scale: Int): Column = c.cast(s"decimal(18,$scale)")

  /** TPC-H Q1-style aggregation: pruned scan + pushed filter + hash agg.
    * Scale note: partial aggregation happens map-side; only |groups| rows
    * shuffle, so this holds at any input size. */
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"), 2)).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"), 2)).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Selective filter + projection; both the predicate and the 4-column
    * read schema must reach the parquet scan (verified via explain). */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") < lit("1997-01-01") &&
              col("l_discount") >= lit(0.05) && col("l_quantity") < lit(24.0))
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
              col("l_extendedprice"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** TPC-H Q3-style join + agg + top-k. customer is small → broadcast side;
    * orders⋈lineitem is the shuffle join; top-10 runs as TakeOrdered. */
  def q03JoinTopK(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(o("o_orderkey"), o("o_orderdate"))
      .agg(sum(dec(l("l_extendedprice") * (lit(1.0) - l("l_discount")), 4))
        .cast("double").as("revenue"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
              col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Left-semi join (EXISTS) with a non-equi conjunct, then priority counts. */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"),
           "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-anti join (NOT EXISTS): customers with no orders, per nation.
    * nation is tiny → broadcast. */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01"))
    val n = Tables.load(s, dir, "nation")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q5-style star join: fact tables shuffle-join on keys, dimension
    * chain (nation→region) broadcasts. Revenue per region for one year. */
  def q06StarJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01"))
    val l = Tables.load(s, dir, "lineitem")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(dec(l("l_extendedprice") * (lit(1.0) - l("l_discount")), 4))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** Window functions: latest 3 orders per customer via row_number. */
  def q07WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.load(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn").cast("bigint").as("rn"),
              col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Top-k by aggregate: 10 biggest customers by lifetime spend. */
  def q08TopK(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"), 2)).cast("double").as("total_spend"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(10)

  /** Distinct aggregates (expand-based multi-distinct in Spark). */
  def q09DistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Set operations: partkeys appearing under both return flags vs only 'R'. */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val rk = l.filter(col("l_returnflag") === "R").select(col("l_partkey").as("partkey")).distinct()
    val ak = l.filter(col("l_returnflag") === "A").select(col("l_partkey").as("partkey")).distinct()
    rk.intersect(ak).withColumn("tag", lit("both"))
      .unionByName(rk.except(ak).withColumn("tag", lit("only_r")))
      .select(col("tag"), col("partkey"))
      .orderBy(col("tag"), col("partkey"))
  }

  /** ROLLUP over the region→nation hierarchy (customer counts). */
  def q11Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
              coalesce(col("n_name"), lit("ALL")).as("nation"),
              col("n_customers"))
      .orderBy(col("region"), col("nation"))
  }

  /** Scalar string functions (all codegen'd builtins, no UDFs). */
  def q12ScalarString(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("bigint").as("name_len"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        lpad(col("p_size").cast("string"), 3, "0").as("size_pad"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** Date/time extraction + aggregation by calendar month. */
  def q13DateExtract(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("bigint").as("o_year"),
        month(col("o_orderdate")).cast("bigint").as("o_month"))
      .agg(sum(dec(col("o_totalprice"), 2)).cast("double").as("month_total"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("o_year"), col("o_month"))

  /** Conditional aggregation (CASE WHEN inside agg) + derived average. */
  def q14ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        sum(dec(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(lit(0.0)), 2))
          .cast("double").as("returned_qty"),
        sum(dec(col("l_extendedprice") * col("l_discount"), 4))
          .cast("double").as("discount_revenue"),
        (sum(dec(col("l_quantity"), 2)).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_linestatus"))
}

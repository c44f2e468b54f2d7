package graft

import org.apache.spark.sql.functions._

/** Smoke + semantic checks for every registered query at sf0.001.
  * (Numeric parity vs DuckDB is covered by the driver's oracle gate and
  * tools/check_oracle.py; these tests pin semantics that the oracle can't,
  * e.g. plan shape and invariants.) */
class QueriesSpec extends SparkSpec {

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query with an oracle has matching column sets is a subset of queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 pushes filter and prunes columns at the parquet scan") {
    val plan = graft.queries.Relational.q01Agg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$plan")
    // read schema must not include unused columns like l_orderkey/l_tax
    val scanLine = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!scanLine.contains("l_orderkey") && !scanLine.contains("l_tax"),
      s"scan reads unpruned columns: $scanLine")
  }

  test("q03 broadcasts the filtered customer dimension") {
    val plan = graft.queries.Relational.q03JoinTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("q07 emits at most 3 rows per customer") {
    val df = graft.queries.Relational.q07WindowRank(spark, sf)
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad === 0)
  }

  test("q32 approx distinct stays within HLL++ error bounds of exact") {
    val df = graft.queries.Relational2.q32ApproxDistinct(spark, sf)
    val bad = df.filter(
      abs(col("approx_parts") - col("exact_parts")) >
        col("exact_parts") * 0.15 + 10).count()
    assert(bad === 0)
  }

  test("q17 session counts are bounded by event counts") {
    val df = graft.queries.EventsQueries.q17Sessionize(spark, sf)
    assert(df.filter(col("n_sessions") > col("n_events")).count() === 0)
  }

  test("q18 as-of values come only from earlier clicks") {
    import spark.implicits._
    // a user's first event overall can never have a last_click_value
    val ev = Tables.load(spark, sf, "events")
    val firstPurchaseNoClick = ev
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("user_id").agg(min(struct(col("ts"), col("event_id"))).as("first"))
      .select(col("user_id"), col("first.event_id").as("event_id"))
    val res = graft.queries.EventsQueries.q18AsOfJoin(spark, sf)
    val bad = res.join(firstPurchaseNoClick, Seq("user_id", "event_id"))
      .filter(col("last_click_value").isNotNull).count()
    assert(bad === 0)
  }

  test("q74 BM25 broadcasts its model tables (term stats + corpus row)") {
    val plan = graft.queries.Quality.q74Bm25(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"BM25 model tables must broadcast, got:\n$plan")
    // the token stream must never be on the build side of a broadcast:
    // model tables are |query terms| + 1 rows
    assert(!plan.contains("CartesianProduct"), "no cartesian in the BM25 plan")
  }

  test("q73 PII redaction is scan-local: one exchange (the output sort)") {
    val plan = graft.queries.Quality.q73PiiRedact(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1,
      s"redaction must not shuffle data (scan → project → sort), got $exchanges:\n$plan")
  }

  test("q70 heavy-hitters guarantee booleans are all true (space-saving invariant)") {
    val df = graft.queries.Quality.q70HeavyHitters(spark, sf)
    assert(df.filter(!col("guarantee_ok")).count() === 0)
  }

  test("q79 weighted sample favors heavier docs: mean sampled length > corpus mean") {
    val docs = Tables.load(spark, sf, "documents")
    val sampled = graft.queries.Quality.q79WeightedSample(spark, sf)
    val mAll = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    val mSel = sampled.agg(avg(col("n_chars"))).head.getDouble(0)
    assert(mSel > mAll,
      s"length-weighted sampling must tilt long: sampled $mSel vs corpus $mAll")
  }

  test("q86 contamination: train docs never appear; fractions within [0,1]") {
    val df = graft.queries.TextQueries.q86Contamination(spark, sf)
    assert(df.filter(col("split") === "train").count() === 0)
    assert(df.filter(col("contamination") < 0 || col("contamination") > 1).count() === 0)
  }
}

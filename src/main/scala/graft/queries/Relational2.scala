package graft.queries

import graft.Tables
import graft.functions.VectorExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational coverage batch: exact percentiles, CUBE / GROUPING
  * SETS, full-outer & cross joins, scalar subqueries, offset pagination,
  * ordered collect, pivot, array ops and a window-function suite. Same
  * oracle-parity conventions as [[Relational]].
  */
object Relational2 {

  private def dec(c: org.apache.spark.sql.Column, scale: Int) =
    c.cast(s"decimal(18,$scale)")

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`: both use the (n-1)·p linear-interpolation rule). */
  def q19Percentile(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("median_qty"),
        // array form: one collection of l_extendedprice for both quantiles
        percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.75))).as("pp"))
      .select(col("l_returnflag"), col("median_qty"),
        round(col("pp")(0), 6).as("p25_price"),
        round(col("pp")(1), 6).as("p75_price"))
      .orderBy(col("l_returnflag"))

  /** CUBE over (region, order priority). */
  def q25Cube(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("r_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"))
      .orderBy(col("region"), col("priority"))
  }

  /** Full outer join with both-sided nulls (customer slice vs order-agg slice). */
  def q26FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < 1000)
      .select(col("c_custkey").as("custkey"), col("c_acctbal"))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_custkey") >= 500)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        col("c_acctbal").isNotNull.as("has_customer"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("custkey"))
  }

  /** Cross join (tiny × tiny): every region × order priority with counts. */
  def q27CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(s, dir, "region").select(col("r_name"))
    val p = Tables.load(s, dir, "orders").select(col("o_orderpriority")).distinct()
    r.crossJoin(p)
      .select(concat_ws("/", col("r_name"), col("o_orderpriority")).as("combo"))
      .orderBy(col("combo"))
  }

  /** Scalar subquery: orders above 1.9× the global average price, per
    * priority. The average is decimal-exact (deterministic), joined in via
    * a broadcast of the 1-row aggregate. */
  def q28ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val avgP = o.agg(
      (sum(dec(col("o_totalprice"), 2)).cast("double") / count(lit(1))).as("avg_price"))
    o.crossJoin(broadcast(avgP))
      .filter(col("o_totalprice") > col("avg_price") * 1.9)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_big_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** UNION ALL + ORDER BY + LIMIT/OFFSET pagination. */
  def q29UnionOffset(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    // SQL "LIMIT 10 OFFSET 5" = skip 5, take 10 → offset BEFORE limit here
    val hi = o.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(5).limit(10).select(lit("hi").as("tag"), col("o_orderkey"))
    val lo = o.orderBy(col("o_totalprice").asc, col("o_orderkey"))
      .offset(5).limit(10).select(lit("lo").as("tag"), col("o_orderkey"))
    hi.unionAll(lo).orderBy(col("tag"), col("o_orderkey"))
  }

  /** Custom KMV sketch distinct (TypedImperativeAggregate) vs the exact
    * count. The sketch value itself is engine-specific, so the hash-gated
    * output is the exact count plus a deterministic error-bound check:
    * |kmv − exact| ≤ 4σ·exact with σ = 1/√(k−2) — always true for a correct
    * sketch, trivially SQL-expressible for the oracle. */
  def q47KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val k = 256
    val bound = 4.0 / math.sqrt(k - 2.0)
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        graft.functions.KmvDistinct.kmvDistinct(col("l_partkey"), k).as("kmv_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("kmv_parts") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * bound).as("kmv_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Approximate distinct (HLL++, default rsd 5%) vs exact. Same oracle
    * shape as q47: exact count + a 3σ error-bound boolean (the sketch value
    * is engine-specific, the bound check is deterministic). */
  def q32ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * 0.15).as("approx_ok"))
      .orderBy(col("l_returnflag"))

  /** Explicitly SALTED fact⋈dim join (Skew.saltedJoin): the large side is
    * scattered across 8 salt buckets, the small side replicated 8× — the
    * manual mitigation for hot keys beyond what AQE's skew-join split
    * handles. Salting only splits work, so the oracle is the PLAIN join:
    * a green hash proves salt-and-replicate changes nothing semantically. */
  def q57SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val sup = Tables.load(s, dir, "supplier")
    graft.operators.Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey", 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_quantity"), 2)).cast("double").as("total_qty"))
      .orderBy(col("s_nationkey"))
  }

  /** Approximate percentiles — the 100 TB scale path for q19's exact
    * percentiles (approx_percentile is a mergeable KLL-style sketch with
    * bounded RANK error, where exact percentile collects every value).
    * Gated like q32/q47: the hash-exact output is the exact median plus a
    * boolean asserting the sketch value lands within the p45–p55 exact
    * band — a 5% rank-error envelope vs the sketch's 1/accuracy = 0.01%. */
  def q55ApproxPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap"),
        // one array-form percentile = ONE collection of the column for all
        // three exact quantiles (three scalar calls would collect it 3x)
        percentile(col("l_extendedprice"),
          array(lit(0.45), lit(0.5), lit(0.55))).as("pct"))
      .select(col("l_returnflag"),
        round(col("pct")(1), 6).as("median_price"),
        (col("ap") >= col("pct")(0) && col("ap") <= col("pct")(2)).as("approx_ok"))
      .orderBy(col("l_returnflag"))

  /** Deterministic content-addressed sampling: keep documents whose
    * FNV-1a(text) mod 100 < 10 — the reproducible ~10% sample a training
    * pipeline needs (stable across runs, engines, partitionings, and
    * cluster sizes, unlike seeded Bernoulli `sample()`, whose output
    * depends on partitioning). Bit-exact oracle: DuckDB replays the hash. */
  def q56HashSample(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        pmod(graft.functions.Fnv64.fnv64(col("text")), lit(100L))
          .cast("bigint").as("bucket"), col("lang"))
      .filter(col("bucket") < 10)
      .orderBy(col("doc_id"))

  /** Per-process tmp dir for source round-trip queries. The PID component
    * keeps two JVMs against the same SF dir (e.g. bench and the correctness
    * gate running concurrently) from racing writer-vs-reader on one path;
    * within a process the path is stable, so re-invocations just overwrite. */
  private def roundTripPath(tag: String, dir: String): String =
    System.getProperty("java.io.tmpdir") + s"/graft_${tag}_" +
      Integer.toHexString(dir.hashCode) + "_p" + ProcessHandle.current().pid

  /** Non-parquet source path, oracle-gated: `nation` is re-exported as a
    * header'd CSV (single deterministic file under the JVM tmpdir) and read
    * back through the format-generic IO layer with an enforced schema, then
    * broadcast-joined to the parquet `customer` table. The oracle computes
    * the same aggregate reading nation from parquet — a green hash proves
    * the csv scan/sink round-trip is lossless for this schema. */
  def q54CsvSource(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(s, dir, "nation")
    val csvPath = roundTripPath("csv_nation", dir)
    graft.sources.IO.write(nation, csvPath, format = "csv", coalesceTo = 1)
    val nationCsv = graft.sources.IO.read(s, csvPath, format = "csv",
      schema = Some(nation.schema))
    val c = Tables.load(s, dir, "customer")
    c.join(broadcast(nationCsv), c("c_nationkey") === nationCsv("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"), 2)).cast("double").as("total_acctbal"))
      .orderBy(col("n_name"))
  }

  /** JSON source path, same contract as q54: `region` round-trips through
    * line-delimited JSON via the IO layer (enforced schema) and joins back
    * to parquet tables; the oracle reads region from parquet. */
  def q58JsonSource(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(s, dir, "region")
    val jsonPath = roundTripPath("json_region", dir)
    graft.sources.IO.write(region, jsonPath, format = "json", coalesceTo = 1)
    val regionJson = graft.sources.IO.read(s, jsonPath, format = "json",
      schema = Some(region.schema))
    val n = Tables.load(s, dir, "nation")
    n.join(broadcast(regionJson), n("n_regionkey") === regionJson("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        array_join(sort_array(collect_set(col("n_name"))), ",").as("nations"))
      .orderBy(col("r_name"))
  }

  /** ORC source path (Spark's other vectorized columnar reader): `part`
    * round-trips through ORC via the IO layer; oracle reads parquet. */
  def q59OrcSource(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
    val orcPath = roundTripPath("orc_part", dir)
    graft.sources.IO.write(part, orcPath, format = "orc", coalesceTo = 1)
    val partOrc = graft.sources.IO.read(s, orcPath, format = "orc",
      schema = Some(part.schema))
    partOrc.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("p_size").cast("bigint")).as("total_size"))
      .orderBy(col("p_brand"))
  }

  /** Bloom-filtered selective semi-join (graft.operators.BloomJoin): a
    * compact bloom over the urgent orders' keys pre-filters lineitem AT THE
    * SCAN, before its shuffle; the exact semi-join then removes bloom false
    * positives, so the result — and the oracle — is the plain semi-join.
    * This is the explicit form of Spark's InjectRuntimeFilter shape: at
    * 100 TB the probe-side exchange carries |matches| + fpp·N rows, not N. */
  def q63BloomJoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val urgent = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    graft.operators.BloomJoin
      .semiJoin(l, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 200000L, fpp = 0.01)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice"), 2)).cast("double").as("total_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Stratified deterministic sampling: per-stratum hash-mod rates
    * (returnflag A 5%, N 10%, R 20%) over a content-addressed FNV-1a bucket
    * of the row key — the "sample rares more heavily" primitive of training
    * data curation, reproducible across runs/engines/partitionings (seeded
    * Bernoulli sample() is partition-layout dependent; this is not).
    * Bit-exact oracle: DuckDB replays the hash and the CASE rates. */
  def q65StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .withColumn("bucket",
        pmod(graft.functions.Fnv64.fnv64(
          concat_ws("_", col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"))), lit(1000L)))
      .filter(col("bucket") < when(col("l_returnflag") === "A", 50)
        .when(col("l_returnflag") === "N", 100).otherwise(200))
      .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Ordered set collect: distinct market segments per nation, sorted and
    * comma-joined (deterministic replacement for raw collect_list). */
  def q33CollectAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"))
      .orderBy(col("n_name"))
  }

  /** Pivot: daily event counts, one column per event type. */
  def q34Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("day", col("ts").cast("date"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  /** Array ops over embeddings: per label, first-element mean (decimal-exact)
    * and max L2 norm (native codegen'd NormF). */
  def q35ArrayOps(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("label").cast("bigint").as("label"),
        element_at(col("embedding"), 1).cast("double").as("e1"),
        VectorExpressions.normF(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(
        (sum(dec(col("e1"), 6)).cast("double") / count(lit(1))).as("avg_first"),
        round(max(col("nrm")), 6).as("max_norm"),
        count(lit(1)).as("n_vecs"))
      .orderBy(col("label"))

  /** Window-function suite: running decimal-exact total, lag, ntile. */
  def q36WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"), 2))
          .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        lag(col("o_totalprice"), 1).over(byCust).as("prev_price"),
        ntile(4).over(byCust).cast("bigint").as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Equi + range (interval) join: lineitems shipped within 30 days of
    * their order's date. The equi conjunct keys the shuffle; the range
    * predicate evaluates post-match (no quadratic blowup — this is the
    * banded-range-join shape that survives scale-up). */
  def q38RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey") &&
        l("l_shipdate") >= o("o_orderdate") &&
        l("l_shipdate") < date_add(o("o_orderdate"), 30))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_fast_ships"),
        sum(dec(col("l_quantity"), 2)).cast("double").as("fast_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** RANGE-framed window: 30-day trailing order count per customer (frame
    * bounds in value space — epoch days — not row space). */
  def q39RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val byCustDays = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day_n"))
      .rangeBetween(-29, Window.currentRow)
    Tables.load(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .withColumn("day_n", datediff(col("o_orderdate").cast("date"), lit("1995-01-01")).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("day_n"),
        count(lit(1)).over(byCustDays).as("orders_30d"),
        sum(dec(col("o_totalprice"), 2)).over(byCustDays).cast("double").as("spend_30d"))
      .orderBy(col("o_custkey"), col("day_n"), col("o_orderkey"))
  }

  /** Top-3 orders per customer via the NATIVE TopKPerKey operator (custom
    * LogicalPlan + Strategy + partial/final SparkPlans): map-side bounded
    * heaps shrink the shuffle to ≤k rows per (key, partition) — the window
    * formulation (q07) shuffles and sorts everything. */
  def q46TopKNative(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.perKey(
        Tables.load(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")),
        keyCols = Seq("o_custkey"),
        order = Seq("o_orderdate" -> false, "o_orderkey" -> false),
        k = 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("o_custkey"), col("o_orderkey"))

  /** Explicit GROUPING SETS ((region,nation),(region),()) — customer counts. */
  def q37GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupingSets(Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"))
      .orderBy(col("region"), col("nation"))
  }

  /** MERGE / upsert (SCD type-1): a deterministic change set — updated
    * balances for every 7th customer, plus brand-new customer rows —
    * applied to the base table through Merge.upsert's full-outer
    * coalesce plan (what MERGE INTO executes underneath). The oracle
    * replays change derivation and merge. */
  def q85Upsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val updates = base.filter(pmod(col("c_custkey"), lit(7L)) === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100.0, 2))
    val inserts = base.filter(pmod(col("c_custkey"), lit(13L)) === 0)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        concat(lit("new-"), col("c_name")).as("c_name"),
        col("c_nationkey"), lit(0.0).as("c_acctbal"),
        lit("STARTUP").as("c_mktsegment"))
    graft.operators.Merge.upsert(base, updates.unionAll(inserts),
        Seq("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** SCD type-2 history build: the base snapshot plus two dated change
    * batches become a per-key version chain — valid_from/valid_to via one
    * lead() window per key, open-ended current row flagged. The companion
    * to q85's type-1 overwrite; all arithmetic deterministic (rounded
    * decimals, string dates). */
  def q87Scd2(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("valid_from", lit("2024-01-01"))
    val b1 = base.filter(pmod(col("c_custkey"), lit(7L)) === 0)
      .select(col("c_custkey"), round(col("c_acctbal") + 100.0, 2).as("c_acctbal"),
        lit("2024-06-01").as("valid_from"))
    val b2 = base.filter(pmod(col("c_custkey"), lit(11L)) === 0)
      .select(col("c_custkey"), round(col("c_acctbal") - 50.0, 2).as("c_acctbal"),
        lit("2024-09-01").as("valid_from"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("valid_from"))
    base.unionAll(b1).unionAll(b2)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Z-order (Morton) clustering audit: interleave (l_partkey, l_suppkey)
    * into a Z-value, bucket by its high bits, and emit each bucket's
    * min/max of BOTH keys — the bounded per-bucket rectangles are exactly
    * the min/max file statistics that let a Z-ordered layout prune scans
    * on either key (Layout.zOrderBy is the write-side operator; this query
    * gates the interleave arithmetic bit-exactly). */
  def q82Zorder(s: SparkSession, dir: String): DataFrame = {
    val x = pmod(col("l_partkey"), lit(65536L))
    val y = pmod(col("l_suppkey"), lit(65536L))
    val zs = Tables.load(s, dir, "lineitem")
      .select(graft.operators.Layout.zValue(x, y).as("z"), x.as("xk"), y.as("yk"))
    // 64 buckets normalized by the corpus's max z (key ranges differ by
    // SF): z·64/(zmax+1) — exact double arithmetic (z < 2^32, ·64 < 2^38)
    val zmax = zs.agg(max(col("z")).as("zmax"))
    zs.crossJoin(broadcast(zmax))
      .groupBy(floor(col("z") * lit(64.0) / (col("zmax") + 1)).cast("bigint")
        .as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("xk")).as("x_min"), max(col("xk")).as("x_max"),
        min(col("yk")).as("y_min"), max(col("yk")).as("y_max"))
      .orderBy(col("zbucket"))
  }
}

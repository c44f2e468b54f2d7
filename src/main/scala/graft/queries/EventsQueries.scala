package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream shaped queries over the `events` table: time bucketing,
  * JSON extraction, gap-based sessionization, and an as-of join.
  *
  * These are the batch duals of the Structured Streaming operators in
  * `graft.streaming` — same logical semantics, so the streaming paths can be
  * spot-checked against these deterministic batch results.
  */
object EventsQueries {

  /** Tumbling-window (hourly) aggregation. The bucket is emitted as a
    * formatted string (not a raw timestamp) for cross-engine parity. */
  def q15WindowAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour_bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))

  /** JSON property extraction (get_json_object over the `props` column). */
  def q16JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Map-typed columns: parse the JSON props into map<string,bigint> and
    * exercise map functions (size, sorted keys, value lookup). */
  def q45MapOps(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .filter(col("event_id") < 200)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType)))
      .select(col("event_id"),
        size(col("m")).cast("bigint").as("n_keys"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys_sorted"),
        element_at(col("m"), "k").as("k_val"))
      .orderBy(col("event_id"))

  /** Gap-based sessionization: a new session starts after a >30 min silence
    * per user. lag + running sum over an event-time window — the classic
    * two-window formulation; all arithmetic on integral epoch-micros so both
    * engines agree bit-for-bit. */
  def q17Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    Tables.load(s, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(
        max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Native session_window sessionization — the BUILT-IN operator next to
    * q17's composed lag/sum formulation (one shuffle on (user, session),
    * merge-capable, and the same operator Structured Streaming uses for
    * session state). Boundary semantics differ from q17 by one instant: a
    * session closes when the next event is >= gap after the latest one
    * (interval end exclusive), where q17's lag test uses strict >. The
    * oracle replays the >= rule, gating the actual operator semantics. */
  def q68SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start").cast("timestamp")).as("session_start_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** As-of join: for every purchase, the value of that user's most recent
    * strictly-earlier click. Composed from built-ins (window + last/ignoreNulls
    * over a union of both event kinds) rather than a custom physical operator —
    * one shuffle on user_id, no range-join blowup, holds at scale. */
  def q18AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("last_click_value",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
              col("value").as("purchase_value"), col("last_click_value"))
      .orderBy(col("event_id"))
  }

  /** Ordered funnel analysis: view → click → purchase, each stage's entry
    * timestamp being the user's FIRST qualifying event strictly after the
    * previous stage (min-aggregate per stage + broadcast join of the
    * shrinking per-user stage table — never a window over the full
    * stream). Emits stage populations, the classic conversion report. */
  def q83Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts_us")).as("tv"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_us") > col("tv"))
      .groupBy("user_id").agg(min(col("ts_us")).as("tc"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_us") > col("tc"))
      .groupBy("user_id").agg(min(col("ts_us")).as("tp"))
    v.agg(count(lit(1)).as("n")).select(lit("1_view").as("stage"), col("n"))
      .unionAll(c.agg(count(lit(1)).as("n"))
        .select(lit("2_click_after_view").as("stage"), col("n")))
      .unionAll(p.agg(count(lit(1)).as("n"))
        .select(lit("3_purchase_after_click").as("stage"), col("n")))
      .orderBy(col("stage"))
  }

  /** Retention cohorts: users grouped by first-activity day, counted on
    * each subsequent activity-day offset — the standard warehouse cohort
    * triangle. Two key-partitioned aggregates + one join, all on user_id
    * then (cohort, offset). */
  def q84Retention(s: SparkSession, dir: String): DataFrame = {
    val act = Tables.load(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val coh = act.groupBy("user_id").agg(min(col("d")).as("cohort"))
    act.join(coh, "user_id")
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("bigint").as("day_offset"), col("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Time-series resample + gap-fill: daily per-user activity densified
    * over each user's own [first, last] day span (a generated date spine,
    * exploded per user — no driver-side calendar), missing days zero-
    * filled and the daily value total carried forward (LOCF). The spine
    * explode and the left join both key on user_id, so the whole plan
    * re-uses one partitioning; at 100 TB the spine side is |users|·|days|
    * rows — tiny next to the event stream it fills. */
  def q78GapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("value"))
      .groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(col("user_id"),
        explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    val locf = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.as("filled"),
        last(col("sum_v"), ignoreNulls = true).over(locf).as("locf_sum_v"))
      .orderBy(col("user_id"), col("day"))
  }
}

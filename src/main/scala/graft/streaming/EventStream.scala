package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming duals of the batch event queries: the same logical
  * semantics as q15 (tumbling-window agg) and q17 (gap sessionization),
  * expressed as streaming plans. The reference engine has no streaming at
  * all (SURVEY.md §2.1) — its marker ledger is a batch-incremental
  * substitute; `Trigger.AvailableNow` over a file source is the idiomatic
  * Spark replacement (SURVEY.md §1.1).
  *
  * The `ts` column is schema-on-read (SURVEY.md §1.3): testdata has shipped
  * it both as physical INT64 TIMESTAMP(NANOS) — which Spark's parquet reader
  * rejects without the legacy raw-nanos conf — and as plain timestamp[us].
  * A streaming file source needs an explicit schema, so readEvents peeks the
  * actual footer schema via a one-off batch read and branches exactly like
  * the batch path (Tables.load): LongType → raw nanos, floor-divide to µs;
  * timestamp → direct read, no division. Event time is converted to
  * TIMESTAMP (LTZ) — NOT the batch path's TIMESTAMP_NTZ, because watermarks
  * require LTZ; readEvents enforces a UTC session so the two renderings
  * coincide.
  */
object EventStream {

  /** The canonical events schema with a caller-chosen `ts` rendering —
    * for deployments that must define the stream BEFORE the first file
    * lands (no footer to peek). */
  private def eventsSchema(ts: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", ts),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Open a streaming view of an events parquet path.
    *
    * `tsRendering`: None (default) peeks the existing file's footer and
    * branches on the actual physical type — the robust choice when data
    * is already present. A deployment that starts the stream BEFORE the
    * first file lands must pass the expected rendering explicitly
    * (LongType for raw nanos, TimestampNTZType for timestamp[us]),
    * because there is no footer to peek yet. */
  def readEvents(spark: SparkSession, dir: String,
      tsRendering: Option[DataType] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file-stream sources require a directory; glob-filter to the one table
    // Event time must stay TIMESTAMP_LTZ: Spark rejects watermarks on
    // TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), while the batch
    // path (Tables.load) uses NTZ. The two renderings agree only when the
    // session timezone is UTC — enforce that as a fail-fast contract
    // instead of letting a non-UTC session silently skew bucket strings.
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC,
      s"EventStream requires a UTC session timezone (got '$tz'): streaming " +
        "event-time is TIMESTAMP_LTZ (watermark requirement) and its " +
        "rendering must match the batch path's TIMESTAMP_NTZ")
    // Footer peek: a metadata-only batch read (no rows materialized) tells
    // us which physical rendering this copy of the table carries; the
    // streaming source's explicit schema must match it or Spark silently
    // mis-renders the column (raw µs read as ns ⇒ every event lands in 1970).
    val schema = tsRendering match {
      case Some(t) => eventsSchema(t)
      case None => spark.read.parquet(s"$dir/events.parquet").schema
    }
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    schema("ts").dataType match {
      case LongType => // physical INT64 TIMESTAMP(NANOS) read as raw nanos
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType => // plain timestamp[us]: NTZ wall time == LTZ under UTC
        stream.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => stream
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet rendering $other")
    }
  }

  /** Hourly tumbling-window counts with a 1-hour watermark — the streaming
    * dual of q15 (same buckets; late data beyond the watermark is dropped). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour_bucket"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on a key with bounded state: the watermark lets
    * the engine drop dedup state older than the lateness horizon — the
    * streaming form of the exact-dedup operator (without it, state grows
    * unboundedly at 100 TB/day). */
  def dedupByKey(events: DataFrame, keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates(keyCols :+ "ts")

  /** Key-only streaming dedup: unlike [[dedupByKey]] (exact (key, ts)
    * match), this drops a RE-DELIVERED event whose retry carries a
    * different timestamp — the at-least-once-ingestion case — as long as
    * the copies arrive within the watermark of each other. State stores
    * only keys and expires on the watermark, so it stays bounded without
    * requiring duplicate timestamps to be byte-identical. */
  def dedupWithinWatermark(events: DataFrame,
      keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keyCols)

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  final case class SessionState(lastTsUs: Long, sessions: Long, events: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful gap sessionization via flatMapGroupsWithState — the streaming
    * dual of q17. State per user: last event time + counters; a >30 min gap
    * starts a new session. Emits the running totals each trigger. */
  def sessionize(events: DataFrame)(implicit spark: SparkSession): Dataset[UserSessions] = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000 * 1000
    events.select(col("event_id"), col("ts"), col("user_id")).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // within a micro-batch, order by event time (engine does not sort)
          def micros(e: Event): Long =
            math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
          val sorted = rows.toSeq.sortBy(e => (micros(e), e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val tsUs = micros(e)
            val isNew = st.lastTsUs == Long.MinValue || tsUs - st.lastTsUs > gapUs
            st = SessionState(tsUs, st.sessions + (if (isNew) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator(UserSessions(userId, st.sessions, st.events))
      }
  }

  /** Stream-stream interval join — the streaming dual of the as-of/interval
    * join shape (batch q18/q38): each purchase joins every click by the
    * SAME user in the preceding hour. Both sides carry watermarks and the
    * join condition bounds each side's event time relative to the other,
    * which is exactly what lets the engine EXPIRE buffered rows: a click
    * older than (purchase watermark − 1 h) can never match again and its
    * state is dropped — without the time bound, stream-stream join state
    * grows forever at 100 TB/day. Inner join → append mode. */
  def purchaseClickJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "1 hour")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** Drain a streaming DataFrame through a memory sink synchronously
    * (AvailableNow semantics for tests/backfills); returns the result table. */
  def drainToTable(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}

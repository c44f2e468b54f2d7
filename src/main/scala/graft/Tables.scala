package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads go through
  * `spark.read.parquet` so Catalyst gets column pruning and predicate
  * pushdown for free; no schema is forced (schema-on-read, matching the
  * reference engine's behavior — reference/src/Split/parquet-splitter.py:84-88).
  *
  * `events.ts` is physically INT64 TIMESTAMP(NANOS), which Spark's parquet
  * reader rejects. We read it as raw nanos (legacy conf) and convert to a
  * microsecond TIMESTAMP_NTZ with integer floor-division — the exact same
  * ns→µs truncation DuckDB applies, so oracle comparisons agree.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // Runtime-settable legacy conf; scoped to this session.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      // driver testdata carries raw INT64 nanos; a re-written copy (e.g.
      // ScaleProbe's replicated tables) is already a converted timestamp
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      else raw
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}

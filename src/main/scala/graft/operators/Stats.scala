package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics over a numeric column — the profiling pass a
  * pipeline runs before choosing partition bounds, salting thresholds, or
  * outlier filters.
  *
  * Scale shape: everything here is a single hash-aggregate over the scan
  * (one shuffle on the bucket id, partial map-side combine), no windows,
  * no joins — the cheapest possible distributed plan for a 100 TB profile
  * pass.
  */
object Stats {

  /** Equi-width histogram with clamped open tails: values below `lo` land
    * in bucket 0, values ≥ `hi` in bucket `nBuckets - 1`. Emits one row
    * per NON-EMPTY bucket: (bucket, bucket_lo, bucket_hi, n, sum) — empty
    * buckets are absent rather than zero-filled so the output stays
    * bounded by the data, not the parameter choice (densify with a
    * sequence join if a chart needs it).
    *
    * The aggregated value is summed through DECIMAL(18,2) and emitted as
    * double — floating-point addition order varies with partitioning, so a
    * raw double sum is not reproducible across runs/engines; fixed-point
    * is (same convention as the join/agg query surface). */
  def equiWidthHistogram(df: DataFrame, value: Column,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && hi > lo, "need hi > lo and at least one bucket")
    val width = (hi - lo) / nBuckets
    val b = least(greatest(floor((value - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("bigint")
    df.groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(value.cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * lit(width), 6).as("bucket_lo"),
        round(lit(lo) + (col("bucket") + 1) * lit(width), 6).as("bucket_hi"),
        col("n"), col("sum_value"))
  }
}

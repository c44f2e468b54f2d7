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

  /** Pearson correlation + covariance per group, DETERMINISTICALLY: the
    * five moment sums (Σx, Σy, Σxy, Σx², Σy²) are accumulated through
    * DECIMAL after per-row rounding — exact, partition-order-independent —
    * then the textbook formulas run once on the aggregated doubles.
    * Spark's built-in corr/covar_samp accumulate running doubles whose
    * value depends on partition order; this formulation is the
    * reproducible variant (and what a 100 TB job wants anyway: one
    * map-side-combined aggregate, no second pass). */
  def corrByKey(df: DataFrame, key: Column, x: Column, y: Column): DataFrame = {
    def d(c: Column): Column = round(c, 9).cast("decimal(28,9)")
    // degenerate groups: n == 1 divides by zero in covar, zero variance
    // divides by zero in corr — ANSI mode makes those job-fatal, so both
    // emit NULL instead (mirrored in the oracle SQL)
    val cov = col("sxy") - col("sx") * col("sy") / col("n")
    val varProd = (col("sxx") - col("sx") * col("sx") / col("n")) *
      (col("syy") - col("sy") * col("sy") / col("n"))
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"),
        sum(d(x)).cast("double").as("sx"),
        sum(d(y)).cast("double").as("sy"),
        sum(d(x * y)).cast("double").as("sxy"),
        sum(d(x * x)).cast("double").as("sxx"),
        sum(d(y * y)).cast("double").as("syy"))
      .select(col("key"), col("n"),
        when(col("n") > 1, round(cov / (col("n") - 1), 6)).as("covar"),
        when(col("n") > 1 && varProd > 0, round(cov / sqrt(varProd), 6))
          .as("corr"))
  }

  /** Equi-depth (quantile) histogram: `nBuckets` buckets of ~equal row
    * count via ntile over a DETERMINISTIC total order (value, tiebreak) —
    * per-bucket bounds are the empirical quantile edges. Complements
    * [[equiWidthHistogram]]: equal-width shows the shape, equal-depth
    * gives splitter-friendly range bounds (what repartitionByRange
    * samples for, computed exactly).
    *
    * AUDIT-SCALE operator (like ngramJaccard): the unpartitioned ntile
    * window funnels every row through one task. Exact global quantile
    * edges inherently need a global order; at 100 TB run this on a
    * deterministic hash-mod sample (q56) or use the mergeable
    * approx-percentile sketch (q55) — those are the scale paths, this is
    * the exact reference they are checked against. */
  def equiDepthHistogram(df: DataFrame, value: Column, tiebreak: Column,
      nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("v"), col("t"))
    df.select(value.as("v"), tiebreak.as("t"))
      .withColumn("bucket", ntile(nBuckets).over(w).cast("bigint"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
  }

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

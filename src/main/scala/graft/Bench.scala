package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Timed action: a noop-format write. It executes the WHOLE physical
    // plan including a final ORDER BY — under a count()-only action,
    // Catalyst's EliminateSorts removes the output sort and every
    // orderBy-terminated query is under-measured.
    def run(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // JIT/codegen warm-up: run every query once at the smallest SF so the
    // timed pass measures the engine, not JVM warm-up.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try run(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    // A failed query is reported as a NEGATIVE time-to-failure and listed
    // under "errors", and is excluded from the total — never disguised as
    // a fast success.
    //
    // min-of-N timing (default 2): a single pass is hostage to transient
    // host contention — round 3's recorded numbers showed unrelated
    // trivial aggregates at 20×+ their reproducible time while an
    // immediate re-run matched round 2. The minimum over passes is the
    // standard estimator for "what the engine costs when the machine
    // isn't busy".
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(fn(spark, sfDir)); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) dt else -dt
      }
      // ANY failed rep marks the query failed — a flaky query must never
      // masquerade as a fast success just because one rep got through
      name -> (if (times.forall(_ >= 0)) times.min else times.filter(_ < 0).head)
    }
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","errors":${errors.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}

package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("well-separated synthetic clusters are recovered exactly under spread init") {
    import spark.implicits._
    // 4 far-apart base directions, 12 tight copies each; one init seed
    // per true cluster (the k-means++/maxmin situation) → Lloyd must put
    // every copy with its base
    def vec(base: Int, copy: Int): Array[Float] = {
      val r = new scala.util.Random(base + 7)
      val b = Array.fill(64)(r.nextGaussian() * 10)
      val rn = new scala.util.Random(base * 131 + copy)
      b.map(x => (x + 0.01 * rn.nextGaussian()).toFloat)
    }
    val rows = for (b <- 0 until 4; c <- 0 until 12)
      yield (b * 12L + c, vec(b, c))
    val df = rows.toDF("vec_id", "embedding")
    val seedInit = df.filter(col("vec_id") % 12 === 0) // one per cluster
      .select((col("vec_id") / 12).cast("int").as("cid"),
        posexplode(col("embedding")).as(Seq("dim", "c")))
      .select(col("cid"), col("dim"), col("c").cast("double").as("c"))
    val assigned = KMeans.fit(df, k = 4, iterations = 3,
      initCentroids = Some(seedInit)).cache()
    // every true cluster maps to exactly one learned cid and vice versa
    val m = assigned.withColumn("truth", floor(col("id") / 12))
      .groupBy("truth").agg(countDistinct("cid").as("k"),
        count(lit(1)).as("n"))
    assert(m.filter(col("k") =!= 1 || col("n") =!= 12).count() == 0,
      "each true cluster must land in exactly one learned cluster")
    assert(assigned.select("cid").distinct().count() == 4)
  }

  test("maxmin init spreads one seed per well-separated cluster — recovery needs no manual seeding") {
    import spark.implicits._
    def vec(base: Int, copy: Int): Array[Float] = {
      val r = new scala.util.Random(base + 7)
      val b = Array.fill(64)(r.nextGaussian() * 10)
      val rn = new scala.util.Random(base * 131 + copy)
      b.map(x => (x + 0.01 * rn.nextGaussian()).toFloat)
    }
    val rows = for (b <- 0 until 4; c <- 0 until 12)
      yield (b * 12L + c, vec(b, c))
    val df = rows.toDF("vec_id", "embedding")
    val assigned = KMeans.fit(df, k = 4, iterations = 2,
      initCentroids = Some(KMeans.initMaxMin(df, 4))).cache()
    val m = assigned.withColumn("truth", floor(col("id") / 12))
      .groupBy("truth").agg(countDistinct("cid").as("k"), count(lit(1)).as("n"))
    assert(m.filter(col("k") =!= 1 || col("n") =!= 12).count() == 0,
      "farthest-point init must land one seed per separated cluster")
    assert(assigned.select("cid").distinct().count() == 4)
  }

  test("fit is deterministic and total (every vector assigned once)") {
    val a = KMeans.fit(emb).cache()
    assert(a.count() == emb.count())
    assert(a.groupBy("id").count().filter(col("count") > 1).count() == 0)
    val b = KMeans.fit(emb)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("a second Lloyd round never increases inertia") {
    def inertia(iters: Int): Double =
      KMeans.summary(KMeans.fit(emb, iterations = iters))
        .agg(sum("inertia")).head.getDouble(0)
    assert(inertia(2) <= inertia(1) + 1e-6,
      "Lloyd update must not increase total inertia")
  }

  test("fit plan: broadcast centroids, cached dims, no cartesian, no window") {
    val plan = KMeans.fit(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // the k·D centroid table must ride a broadcast, never a shuffle join
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    // the exploded (id, dim, x) scan is persisted: every Lloyd subtree
    // reads the cache instead of re-scanning the source (round-6 change)
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))
    // seed numbering is windowless — the old partition-less row_number
    // flooded logs with single-partition WindowExec warnings
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("distanceOutliers flags the planted far point, keeps the tight cluster") {
    import spark.implicits._
    // one tight cluster of 9 near-identical vectors plus one point 100x
    // further out: with k=1 every point shares a centroid, the far point
    // carries almost all the cluster's d2 mass and must be the only
    // outlier at factor=2
    def v(eps: Double): Array[Float] =
      Array.tabulate(64)(d => (if (d == 0) 1.0 + eps else 0.0).toFloat)
    val rows = (0 until 9).map(i => (i.toLong, v(i * 0.001))) :+ (9L, v(100.0))
    val out = KMeans.distanceOutliers(rows.toDF("vec_id", "embedding"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(9L), "far point must be flagged")
    assert((0 until 9).forall(i => !out(i.toLong)), "tight points must pass")
  }

  test("distanceOutliers: degenerate all-identical cluster pins ratio 0, not NaN") {
    import spark.implicits._
    val v = Array.fill(64)(1.0f)
    val rows = (0 until 4).map(i => (i.toLong, v))
    val got = KMeans.distanceOutliers(rows.toDF("vec_id", "embedding"), k = 1)
      .collect()
    assert(got.forall(r => r.getDouble(3) == 0.0 && !r.getBoolean(4)))
  }
}

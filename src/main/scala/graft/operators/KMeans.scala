package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed k-means over embedding columns (Lloyd's algorithm,
  * "Least squares quantization in PCM", IEEE Trans. IT 1982) as pure
  * DataFrame plans — the clustering primitive under semantic sharding,
  * IVF index builds, and PQ codebook training.
  *
  * FIXED iteration count and CONTENT-ADDRESSED initialization (the k
  * hash-least vectors seed the centroids — the q44/q56/q96 convention),
  * so the fit is a closed-form function of the data: no RNG, no
  * convergence test, and an unrolled SQL oracle replays every round
  * bit-exactly (the q81 PageRank recipe applied to clustering).
  *
  * Determinism contract: squared distances are per-dimension-rounded to
  * 12 decimals and summed through DECIMAL; argmin ties break on centroid
  * id; centroid updates divide an exact decimal sum by the exact count
  * and round to 12. Every arithmetic step is partition-order-independent.
  *
  * Scale shape per iteration: one broadcast of the k·D centroid table to
  * the (id, dim, x) scan, one (id, cid)-keyed aggregate for distances,
  * one (id)-keyed argmin aggregate, one (cid, dim)-keyed mean aggregate —
  * all map-side-combining hash aggregates over scans; database vectors
  * never pair with each other. Empty clusters (possible when k exceeds
  * the natural cluster count) simply vanish from the next round's
  * centroid table, mirroring the oracle's replay.
  */
object KMeans {

  /** The k hash-least vectors numbered cid = 0..k-1 in (hash, id) order:
    * (cid, sid, v, hk). Numbering is a partition-local id over the ≤k
    * seed rows pinned to ONE explicitly-coalesced sorted partition — same
    * single-task work as a partition-less row_number window, but without
    * WindowExec's "no partition defined" warning, which at hundreds of
    * seed builds per bench pass buries real signals in the log tail. */
  private[operators] def hashSeeds(emb: DataFrame, k: Int, idCol: String,
      vecCol: String): DataFrame =
    emb.select(col(idCol).as("sid"), col(vecCol).as("v"),
        graft.functions.Fnv64.fnv64(col(idCol).cast("string")).as("hk"))
      .orderBy(col("hk"), col("sid")).limit(k)
      .coalesce(1).sortWithinPartitions(col("hk"), col("sid"))
      .withColumn("cid", monotonically_increasing_id().cast("int"))

  /** (cid, dim, c) initial centroids: the k hash-least vectors' components
    * (FNV-1a of the id string — engine-replayable). */
  def init(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    hashSeeds(emb, k, idCol, vecCol)
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "c")))
      .select(col("cid"), col("dim"), col("c").cast("double").as("c"))

  private[operators] def dimRows(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim"), col("x").cast("double").as("x"))

  /** Deterministic FARTHEST-POINT (maxmin) init — the spread guarantee the
    * one-shot hash seeding lacks: seed 0 is the hash-least vector, each
    * subsequent seed the point maximizing its distance to the nearest
    * already-chosen seed (ties → smaller id). On well-separated data this
    * provably lands one seed per cluster (it is the 2-approximation
    * k-center heuristic, Gonzalez 1985). O(k·N) with k bounded one-row
    * driver collects (the pick ids — metadata, not data, same budget as
    * Components' convergence flag); every pick is a closed-form function
    * of the data, so an unrolled SQL oracle replays the whole selection. */
  def initMaxMin(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "need at least one centroid")
    val spark = emb.sparkSession
    import spark.implicits._
    // every pick runs an action over a plan referencing dims (twice per
    // d2To: the pick filter + the join) — cached, the explode scan runs
    // once for all k picks instead of O(k) times; released before return
    val dims = dimRows(emb, idCol, vecCol).persist(StorageLevel.MEMORY_AND_DISK)
    // exact decimal-summed squared distance of every point to one pick
    def d2To(pickId: Long): DataFrame = {
      val pick = dims.filter(col("id") === pickId)
        .select(col("dim"), col("x").as("px"))
      val diff = col("x") - col("px")
      dims.join(broadcast(pick), Seq("dim"))
        .groupBy(col("id"))
        .agg(sum(round(diff * diff, 12).cast("decimal(28,12)")).as("d2"))
    }
    val first = emb.select(col(idCol).as("sid"),
        graft.functions.Fnv64.fnv64(col(idCol).cast("string")).as("hk"))
      .orderBy(col("hk"), col("sid")).limit(1)
      .head().getLong(0)
    var chosen = Vector(first)
    // minD is localCheckpoint'd per pick: without truncation the join
    // lineage grows by one stage per pick and every pick's head() replays
    // the whole chain — fine at k=4, quadratic work and a planner blow-up
    // at k=256 (IVF codebook sizes). Superseded checkpoints are freed
    // eagerly, the Components loop discipline.
    var minD = d2To(first).withColumnRenamed("d2", "mind2").localCheckpoint()
    while (chosen.size < k) {
      val next = minD.filter(!col("id").isInCollection(chosen))
        .orderBy(col("mind2").desc, col("id")).limit(1)
        .head().getLong(0)
      chosen = chosen :+ next
      if (chosen.size < k) {
        val refreshed = minD.join(d2To(next), Seq("id"))
          .select(col("id"), least(col("mind2"), col("d2")).as("mind2"))
          .localCheckpoint()
        Components.freeLocalCheckpoint(minD)
        minD = refreshed
      }
    }
    Components.freeLocalCheckpoint(minD)
    val cids = chosen.zipWithIndex.map { case (id, i) => (id, i) }
      .toDF("id", "cid")
    val out = dims.join(broadcast(cids), Seq("id"))
      .select(col("cid"), col("dim"), col("x").as("c"))
    // the picks (the O(k·N) part) are done; the returned k·D-row plan
    // re-reads the source once at the caller's action — release the cache
    dims.unpersist(blocking = false)
    out
  }

  /** Hard assignment against a centroid table: (id, cid, d2) with d2 the
    * exact decimal-summed squared distance to the WINNING centroid.
    *
    * PER-ROW since the optimization round: the centroid table is a frozen
    * model (k·D doubles — bounded driver metadata, collected here like the
    * IVF probed-cell list), so the assignment is a pure scan-local
    * projection ([[graft.functions.ModelExpressions.CellAssignF]]) instead
    * of the old 2-exchange explode→broadcast-join→double-aggregate plan.
    * Arithmetic is bit-identical (same per-dim round-12 terms, exact
    * decimal sum, min-(d2, cid) tie-break, same Decimal(38,12) type) —
    * oracle-gated across q44/q133/q137/q141/q142. Collecting forces a
    * lazy centroid plan (e.g. a fit) to run HERE, once — previously every
    * downstream action recomputed its aggregate subtree. */
  def assign(emb: DataFrame, centroids: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    assignByModel(emb,
      graft.functions.ModelExpressions.collectModel(centroids), idCol, vecCol)

  /** [[assign]] against an already-collected [[graft.functions
    * .ModelExpressions.VectorModel]] — zero exchanges, one projection. */
  def assignByModel(emb: DataFrame,
      model: graft.functions.ModelExpressions.VectorModel,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val s = graft.functions.ModelExpressions
      .cellAssignF(col(vecCol), model).as("s")
    // the null filter replicates the old inner-join semantics: a vector
    // with no contributing dims (null/empty) produced no (id, cid) row
    emb.select(col(idCol).as("id"), s)
      .filter(col("s").isNotNull)
      .select(col("id"), col("s.cid").as("cid"), col("s.d2").as("d2"))
  }

  /** A driver-collected model re-materialized as the standard (cid, dim,
    * c) centroid frame — a LocalTableScan, so plans that still join the
    * model (query-side probe ranking) read it without recomputing the
    * fit subtree that produced it. */
  def localCentroids(spark: org.apache.spark.sql.SparkSession,
      model: graft.functions.ModelExpressions.VectorModel): DataFrame = {
    import spark.implicits._
    model.cids.indices.flatMap { j =>
      model.dims(j).zip(model.cs(j)).map { case (d, c) =>
        (model.cids(j), d, c)
      }
    }.toDF("cid", "dim", "c")
  }

  /** (id, cid, d2) for EVERY (point, centroid) pair — the pre-argmin table
    * [[assign]] reduces; exposed for consumers that rank cells instead of
    * picking one (the IVF multi-probe). */
  private[operators] def cellDistances(dims: DataFrame, centroids: DataFrame): DataFrame = {
    val diff = col("x") - col("c")
    dims.join(broadcast(centroids), Seq("dim"))
      .groupBy(col("id"), col("cid"))
      .agg(sum(round(diff * diff, 12).cast("decimal(28,12)")).as("d2"))
  }

  private def assignDims(dims: DataFrame, centroids: DataFrame): DataFrame =
    cellDistances(dims, centroids)
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("cid"))).as("s"))
      .select(col("id"), col("s.cid").as("cid"), col("s.d2").as("d2"))

  /** `iterations` Lloyd rounds; returns the final hard assignment
    * (id, cid, d2). Initialization defaults to the content-addressed
    * seeds; pass `initCentroids` (cid, dim, c) to start from chosen ones
    * — Lloyd's recovery guarantee holds only when the init spreads across
    * the true clusters (hash seeds can collide into one dense cluster;
    * that is inherent to any O(N) one-shot init, not a defect of the
    * update — production picks k-means++/maxmin when it matters). */
  def fit(emb: DataFrame, k: Int = 8, iterations: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      initCentroids: Option[DataFrame] = None): DataFrame =
    fitManaged(emb, k, iterations, idCol, vecCol, initCentroids)._1

  /** [[fit]] plus the DISPOSAL HANDLE for its dims cache. The returned
    * plan references the exploded (id, dim, x) rows in 2·iterations
    * subtrees (every assignment + every centroid update); persisted, one
    * action materializes the explode once and every other subtree reads
    * the cache — unpersisted, 2 Lloyd rounds cost ~4 redundant full
    * source scans. The cache backs the RETURNED plan, so fit cannot
    * release it itself: call `release()` after the LAST action over the
    * result. Plain [[fit]] users in a bounded session can instead rely
    * on a blanket `spark.catalog.clearCache()` sweep (the bench harness
    * does, between measurements); a long-lived service should use this
    * handle — each unreleased fit leaks one idle executor-storage entry
    * until a global sweep. */
  def fitManaged(emb: DataFrame, k: Int = 8, iterations: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      initCentroids: Option[DataFrame] = None): (DataFrame, () => Unit) = {
    val (assigned, _, release) =
      fitCentroidsManaged(emb, k, iterations, idCol, vecCol, initCentroids)
    (assigned, release)
  }

  /** [[fitManaged]] that ALSO returns the final centroid table (cid, dim,
    * c) — the one the returned assignment was computed against. Consumers
    * that index by cell (the deterministic IVF quantizer) need both: the
    * assignment partitions the corpus, the centroid table ranks cells for
    * query probing with the same arithmetic. */
  def fitCentroidsManaged(emb: DataFrame, k: Int = 8, iterations: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      initCentroids: Option[DataFrame] = None): (DataFrame, DataFrame, () => Unit) = {
    require(iterations >= 1, "k-means needs at least one assignment round")
    val dims = dimRows(emb, idCol, vecCol).persist(StorageLevel.MEMORY_AND_DISK)
    var centroids = initCentroids.getOrElse(init(emb, k, idCol, vecCol))
    var assigned = assignDims(dims, centroids)
    var i = 1
    while (i < iterations) {
      centroids = assigned.select(col("id"), col("cid"))
        .join(dims, Seq("id"))
        .groupBy(col("cid"), col("dim"))
        .agg((sum(round(col("x"), 12).cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("mean"))
        .select(col("cid"), col("dim"), round(col("mean"), 12).as("c"))
      assigned = assignDims(dims, centroids)
      i += 1
    }
    (assigned, centroids, () => { dims.unpersist(blocking = false); () })
  }

  /** Per-cluster summary of a fit: (cid, n_points, inertia). */
  def summary(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_points"),
        round(sum(col("d2")).cast("double"), 6).as("inertia"))

  /** Prototype-distance OUTLIER flags — the cluster-geometry pruning
    * signal of Sorscher et al., "Beyond neural scaling laws: beating
    * power law scaling via data pruning" (NeurIPS'22): score every
    * example by its distance to the nearest k-means prototype; far
    * examples are outliers/hard examples, near ones prototypical. A
    * curation pipeline drops (or up/down-samples) by this flag the same
    * way SemDeDup (q95) drops by pairwise similarity.
    *
    * ratio = d2 · n_cluster / Σ_cluster d2 (how many times the cluster's
    * MEAN squared distance this point sits at), rounded to 6;
    * is_outlier = ratio > factor. Both sides compute the ratio from the
    * identical decimal-summed d2 inputs with the same double ops, so the
    * comparison replays exactly; a degenerate all-at-centroid cluster
    * (Σ d2 = 0) pins ratio 0, not NaN.
    *
    * Scale shape: [[fit]]'s broadcast-centroid aggregates plus ONE window
    * shuffle on the cluster id — cluster partitions only stream a count
    * and a sum. */
  def distanceOutliers(emb: DataFrame, k: Int = 8, iterations: Int = 2,
      factor: Double = 2.0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))
    val ratio = when(col("sum_d2") === 0.0, 0.0)
      .otherwise(round(
        col("d2").cast("double") * col("n_in_cluster") / col("sum_d2"), 6))
    fit(emb, k, iterations, idCol, vecCol)
      .withColumn("n_in_cluster", count(lit(1)).over(w))
      .withColumn("sum_d2", sum(col("d2")).over(w).cast("double"))
      .select(col("id").as("vec_id"), col("cid").cast("bigint").as("cid"),
        round(col("d2").cast("double"), 6).as("d2"),
        ratio.as("ratio"), (ratio > factor).as("is_outlier"))
      .orderBy(col("vec_id"))
  }
}

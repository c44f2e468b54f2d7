package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank over an undirected pair list (Page, Brin, Motwani & Winograd,
  * "The PageRank Citation Ranking", 1999) — graph centrality next to
  * [[Components]]' connectivity: within a near-dup cluster, the highest-
  * rank document is the most-connected variant, a natural canonical-pick
  * criterion richer than min-id; on citation/link-shaped corpora it is
  * the classic quality prior.
  *
  * Power iteration with a FIXED iteration count (no convergence test), so
  * the result is a closed-form function of the edge list that an unrolled
  * SQL oracle replays exactly. Each round is one join + one key-partitioned
  * aggregate over the EDGE list — the same shuffle shape as label
  * propagation, never all-pairs; lineage is truncated per round
  * (localCheckpoint, freed eagerly) exactly like [[Components.connected]].
  *
  * Determinism contract: per-edge contributions pr(u)/deg(u) are rounded
  * to 12 decimals and summed through DECIMAL — double summation order
  * varies with partitioning; decimal addition is exact — then one double
  * multiply-add forms the next rank. Every node in the doubled edge list
  * has deg ≥ 1, so there is no dangling-mass term.
  */
object Graph {

  /** Rank per node id appearing in `pairs`: (id, pr). Ranks sum to ~1.
    *
    * OWNERSHIP: the return value is the final iteration's localCheckpoint;
    * the caller releases it with [[Components.freeLocalCheckpoint]] after
    * the last action (intermediates are freed eagerly per round). */
  def pageRank(pairs: DataFrame, iterations: Int = 5, damping: Double = 0.85,
      aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nRow = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(nRow))
      .select(col("src").as("id"), (lit(1.0) / col("n")).as("pr"))
      .localCheckpoint()
    var i = 0
    while (i < iterations) {
      val contrib = edges
        .join(pr, edges("src") === pr("id"))
        .join(deg.withColumnRenamed("src", "dsrc"), col("src") === col("dsrc"))
        .select(col("dst"),
          round(col("pr") / col("deg"), 12).cast("decimal(28,12)").as("c"))
      val next = contrib.groupBy(col("dst"))
        .agg(sum(col("c")).cast("double").as("s"))
        .crossJoin(broadcast(nRow))
        .select(col("dst").as("id"),
          ((lit(1.0) - lit(damping)) / col("n") + lit(damping) * col("s")).as("pr"))
        .localCheckpoint()
      Components.freeLocalCheckpoint(pr)
      pr = next
      i += 1
    }
    edges.unpersist()
    pr
  }

  /** Triangle counts + LOCAL CLUSTERING COEFFICIENT per node — the graph
    * audit next to [[Components]] (connectivity) and [[pageRank]]
    * (centrality): a near-dup component that is also triangle-dense is a
    * true duplicate CLIQUE (every variant pairs with every other), while
    * a chain/star with no triangles is transitive drift — different
    * curation calls. coeff = 2·T(v) / (deg(v)·(deg(v)−1)), the fraction
    * of a node's neighbor pairs that are themselves linked (Watts &
    * Strogatz, Nature 1998).
    *
    * Shape: edges normalize to (u < v) once, so each triangle a<b<c is
    * enumerated exactly once by the two-join pattern
    * e1(a,b) ⋈ e2(b,c) ⋈ closing e3(a,c) — join-shaped, never all-pairs
    * (Suri & Vassilvitskii, WWW'11; their degree-based orientation is
    * the upgrade when a skewed graph makes high-id hubs — near-dup
    * graphs are small cliques, where id order is as balanced). Per-node
    * rollup explodes each triangle into its 3 corners — one
    * key-partitioned aggregate. The oracle replays the identical
    * enumeration, join for join.
    *
    * OWNERSHIP: the normalized edge list is persisted (5 subtrees read
    * it; `pairs` is typically an expensive LSH plan) and backs the
    * returned DataFrame — like [[KMeans.fit]], release via the session's
    * cache sweep (`spark.catalog.clearCache()`); a long-lived service
    * should call [[triangleStatsManaged]] and release per call. */
  def triangleStats(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id"): DataFrame =
    triangleStatsManaged(pairs, aCol, bCol)._1

  /** [[triangleStats]] with an explicit release handle, mirroring
    * [[KMeans.fitManaged]]: the cache backs the RETURNED plan, so the
    * operator cannot unpersist it itself — call `release()` after the
    * LAST action over the result. Without it every call leaks one idle
    * executor-storage entry until a global sweep. */
  def triangleStatsManaged(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id"): (DataFrame, () => Unit) = {
    val und = pairs.select(
        least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.v") === col("e2.u"))
      .join(und.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val perNode = tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    val coeff = when(col("degree") >= 2,
      round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
        (col("degree") * (col("degree") - lit(1.0))), 6))
      .otherwise(0.0)
    val out = deg.join(perNode, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        coeff.as("clustering_coeff"))
      .orderBy(col("doc_id"))
    (out, () => { und.unpersist(blocking = false); () })
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (q21/q22/q53 output) into dedup CLUSTERS: every document gets a
  * component id (the minimum doc id reachable through any chain of
  * near-dup relations), from which a pipeline keeps one canonical doc per
  * component and drops the rest. Transitivity matters: if A~B and B~C,
  * naive pairwise dropping can keep both A and C even though they are
  * mutual near-dups through B.
  *
  * Algorithm: distributed min-label propagation. Every node starts
  * labeled with its own id; each round propagates labels across edges and
  * keeps the per-node minimum; fixpoint when no label changes. Each round
  * is one shuffle (join + min-aggregate) over the EDGE list — never
  * all-pairs — and converges in O(component diameter) rounds. Near-dup
  * components are overwhelmingly small/star-shaped (a handful of variants
  * of one document), so the diameter is small; `maxIter` caps pathological
  * chains. The driver loop only ever inspects a one-row convergence flag,
  * no data is collected. Lineage is truncated every round
  * (localCheckpoint), the standard guard for iterative DataFrame jobs —
  * at cluster scale use `spark.sparkContext.setCheckpointDir` +
  * reliable checkpoints instead.
  *
  * (For very-high-diameter graphs the alternating large-star/small-star
  * algorithm [Kiveris et al., "Connected Components in MapReduce", SoCC'14]
  * converges in O(log²n) rounds with the same join-shaped primitive; the
  * propagation loop here is the right tradeoff for dedup-shaped graphs.)
  */
object Components {

  /** Component label per node: (id, component) where component = min
    * reachable id. Only nodes that appear in `pairs` are labeled (isolated
    * docs are trivially their own singleton component — join the result
    * back with a left join and coalesce(component, id) if needed).
    *
    * OWNERSHIP: the returned DataFrame is the final round's
    * localCheckpoint — its materialized RDD stays in executor storage
    * until the CALLER releases it with [[freeLocalCheckpoint]] (after the
    * last action over the result) or the session ends. Intermediate
    * rounds are freed eagerly inside the loop; only the returned one is
    * the caller's. */
  def connected(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 30): DataFrame = {
    // undirected: keep each edge in both directions so one join per round
    // propagates labels both ways
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed = round one fused into initialization: label(n) = min(n, min
    // neighbor) from a single edge aggregation — star-shaped components
    // (the common near-dup case) converge on the first fixpoint check
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), min(col("src"))).as("component"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; keep the per-node minimum of
      // (own label, every neighbor's label). The OLD label rides along so
      // the fixpoint check is a filter on the checkpointed result — no
      // second join-job per round.
      val viaEdges = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("component"))
      val next = viaEdges.union(labels)
        .groupBy("id").agg(min(col("component")).as("component"))
        .join(labels.select(col("id"), col("component").as("__prev")), "id")
        .localCheckpoint()
      converged = next.filter(col("component") =!= col("__prev")).isEmpty
      // free the superseded round's checkpoint NOW — relying on driver GC
      // would accumulate up to maxIter label snapshots in executor storage
      freeLocalCheckpoint(labels)
      labels = next.drop("__prev")
      iter += 1
    }
    edges.unpersist()
    require(converged,
      s"label propagation did not converge in $maxIter rounds — component " +
        "diameter exceeds the cap; raise maxIter or switch to large-star/small-star")
    labels
  }

  /** Unpersist the RDD behind a localCheckpoint'd DataFrame (Dataset
    * .unpersist only covers cache-manager entries; a local checkpoint's
    * materialized RDD is reachable through the plan's LogicalRDD leaves).
    * Used by the iterative graph operators for superseded rounds, and
    * PUBLIC because it is also the disposal API for their RESULTS: the
    * DataFrames [[connected]], [[dedupClusters]] and [[Graph.pageRank]]
    * return are final-round local checkpoints the caller owns — call this
    * after the last action over them to release executor storage (a
    * long-lived session that never does accumulates one snapshot per
    * invocation). */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Cluster summary per document: (doc id, component id, component size),
    * the table a dedup pipeline joins against to keep `id == component`
    * (the canonical member) and drop the rest. */
  def dedupClusters(pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val labeled = connected(pairs, aCol, bCol)
    val sizes = labeled.groupBy("component").agg(count(lit(1)).as("component_size"))
    labeled.join(sizes, "component")
      .select(col("id"), col("component"), col("component_size"),
        (col("id") === col("component")).as("is_canonical"))
  }
}

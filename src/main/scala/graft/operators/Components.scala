package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Quality-prioritized SURVIVOR SELECTION — the retention step between
    * clustering and deletion: within each near-dup cluster keep the BEST
    * member, not an arbitrary one. [[dedupClusters]]' `is_canonical`
    * (min id) is the cheap default; real pipelines keep the highest-value
    * variant — C4 keeps the longer page of a duplicate pair, FineWeb/Dolma
    * keep one representative per MinHash cluster — because near-dup
    * variants differ (truncation, boilerplate, encoding damage) and the
    * survivor is the copy that trains the model.
    *
    * Priority = (`priorityCol` DESC, doc id ASC) — longest-text-wins by
    * default, id as the total-order tie-break so the pick is deterministic
    * on any engine. Docs in no pair are singleton components and survive
    * trivially (left join + coalesce, per [[connected]]'s contract).
    *
    * Scale shape: label propagation is per-edge (never all-pairs); the
    * selection itself is ONE shuffle on the component key and two window
    * functions over it. Near-dup clusters are star-shaped and small, so
    * component partitions are balanced; a pathological giant cluster
    * degrades to one wide partition computing a count and a first_value —
    * no quadratic term anywhere. Returned plan contains [[connected]]'s
    * final-round localCheckpoint: release with [[freeLocalCheckpoint]]
    * after the last action. */
  def survivorSelection(docs: DataFrame, pairs: DataFrame,
      priorityCol: String = "n_chars", idCol: String = "doc_id",
      aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val labeled = connected(pairs, aCol, bCol).withColumnRenamed("id", "doc_id")
    val full = docs.select(col(idCol).as("doc_id"), col(priorityCol))
      .join(labeled, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    val part = Window.partitionBy(col("component"))
    val ord = part.orderBy(col(priorityCol).desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    full
      .withColumn("n_members", count(lit(1)).over(part))
      .withColumn("survivor_id", first(col("doc_id")).over(ord))
      .select(col("doc_id"), col("component"), col("n_members"),
        col("survivor_id"), (col("doc_id") === col("survivor_id")).as("keep"))
      .orderBy(col("doc_id"))
  }
}

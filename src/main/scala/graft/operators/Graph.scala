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
}

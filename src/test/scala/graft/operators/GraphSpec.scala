package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("pagerank: star center outranks leaves; ranks sum to ~1") {
    import spark.implicits._
    // star: 1 — {2..9}; plus a disjoint pair (10, 11)
    val pairs = ((2L to 9L).map(i => (1L, i)) :+ (10L, 11L)).toDF("a_id", "b_id")
    val pr = Graph.pageRank(pairs, 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val leaves = (2L to 9L).map(pr)
    assert(leaves.forall(_ < pr(1L)), "star center must outrank every leaf")
    assert(leaves.distinct.size == 1, "symmetric leaves must tie exactly")
    assert(pr(10L) == pr(11L), "the isolated pair is symmetric")
    val total = pr.values.sum
    assert(math.abs(total - 1.0) < 1e-6, s"ranks must sum to ~1, got $total")
  }

  test("pagerank is invariant to input partitioning (decimal-summed contributions)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
      .toDF("a_id", "b_id")
    val a = Graph.pageRank(pairs.repartition(1), 5)
    val b = Graph.pageRank(pairs.repartition(7), 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "rank values must be bit-identical under different partitionings")
  }
}

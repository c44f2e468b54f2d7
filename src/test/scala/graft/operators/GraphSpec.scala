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

  test("triangleStats: square-with-diagonal hand check, path has no triangles") {
    import spark.implicits._
    // square 1-2-3-4-1 plus diagonal 1-3: triangles (1,2,3) and (1,3,4);
    // diagonal nodes deg 3 coeff 2/3, side nodes deg 2 coeff 1;
    // disjoint path 10-11-12 has degrees but zero triangles.
    // Pair orientation is deliberately mixed — normalization must not care.
    val pairs = Seq((1L, 2L), (3L, 2L), (3L, 4L), (4L, 1L), (3L, 1L),
        (10L, 11L), (12L, 11L))
      .toDF("a_id", "b_id")
    val got = Graph.triangleStats(pairs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 2L, 0.666667)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 2L, 0.666667)))
    assert(got(4L) == ((2L, 1L, 1.0)))
    assert(got(10L) == ((1L, 0L, 0.0)))
    assert(got(11L) == ((2L, 0L, 0.0)))
    assert(got(12L) == ((1L, 0L, 0.0)))
  }

  test("triangleStats: a clique of n has C(n-1,2) triangles per node, coeff 1") {
    import spark.implicits._
    val n = 5
    val pairs = (for (i <- 1 to n; j <- i + 1 to n) yield (i.toLong, j.toLong))
      .toDF("a_id", "b_id")
    val got = Graph.triangleStats(pairs).collect()
    assert(got.length == n)
    assert(got.forall(r => r.getLong(1) == n - 1 &&
      r.getLong(2) == (n - 1) * (n - 2) / 2 && r.getDouble(3) == 1.0))
  }
}

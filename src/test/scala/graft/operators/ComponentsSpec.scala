package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain propagates the min label across the whole component") {
    // 1-2-3-4 chain plus a disjoint 10-11 pair: transitivity must pull 4
    // down to component 1 even though (1,4) is not a pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a_id", "b_id")
    val got = Components.connected(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedupClusters marks exactly one canonical member per component") {
    val pairs = Seq((5L, 9L), (9L, 7L), (2L, 3L)).toDF("a_id", "b_id")
    val rows = Components.dedupClusters(pairs).collect()
    val byComp = rows.groupBy(_.getAs[Long]("component"))
    assert(byComp.keySet == Set(2L, 5L))
    for ((comp, members) <- byComp) {
      assert(members.count(_.getAs[Boolean]("is_canonical")) == 1)
      assert(members.find(_.getAs[Boolean]("is_canonical"))
        .get.getAs[Long]("id") == comp)
      assert(members.forall(_.getAs[Long]("component_size") == members.length))
    }
  }

  test("edge direction does not matter (undirected closure)") {
    // labels must flow against the pair orientation too: (4,1) then (1,3)
    val pairs = Seq((4L, 1L), (1L, 3L)).toDF("a_id", "b_id")
    val got = Components.connected(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("long path converges within the iteration cap") {
    val n = 20
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a_id", "b_id")
    val got = Components.connected(pairs).as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("survivorSelection keeps the longest member per cluster, singletons survive") {
    // chain 1~2~3 (one cluster through transitivity) where 2 is longest,
    // plus singleton 9: survivor of {1,2,3} must be 2 even though the
    // min-id canonical would be 1; the singleton keeps itself
    val docs = Seq((1L, 10L), (2L, 99L), (3L, 50L), (9L, 5L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val got = Components.survivorSelection(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("n_members"),
          r.getAs[Long]("survivor_id"), r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) == ((1L, 3L, 2L, false)))
    assert(got(2L) == ((1L, 3L, 2L, true)))
    assert(got(3L) == ((1L, 3L, 2L, false)))
    assert(got(9L) == ((9L, 1L, 9L, true)))
  }

  test("survivorSelection ties on priority break to the smaller id") {
    val docs = Seq((7L, 40L), (4L, 40L)).toDF("doc_id", "n_chars")
    val pairs = Seq((4L, 7L)).toDF("a_id", "b_id")
    val got = Components.survivorSelection(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("survivor_id")).toMap
    assert(got == Map(4L -> 4L, 7L -> 4L))
  }
}

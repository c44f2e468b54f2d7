package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  test("space-saving retains every item with count > n/k, estimates overcount by <= n/k") {
    import spark.implicits._
    // zipf-ish stream: item i appears ~1000/i times; n ≈ 1000·H(50) ≈ 4500
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
    val df = rows.toDF("w").repartition(8) // force partial buffers + merge
    val n = rows.size.toLong
    val k = 16
    val hh = df.agg(HeavyHitters.heavyHitters(col("w"), k).as("hh"))
      .select(explode(col("hh")).as(Seq("item", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(hh.size <= k)
    val bound = n / k
    exact.foreach { case (item, c) =>
      if (c > bound)
        assert(hh.contains(item), s"frequent item $item (count $c > $bound) must be retained")
    }
    hh.foreach { case (item, est) =>
      val c = exact(item)
      assert(est >= c && est - c <= bound,
        s"estimate for $item must overcount by <= n/k: est=$est exact=$c bound=$bound")
    }
  }

  test("sketch serialization round-trips through the shuffle (merge across partitions)") {
    import spark.implicits._
    // two disjoint halves in different partitions: the merged sketch must
    // see both (sum of counts preserved for items under no contention)
    val df = ((1 to 100).map(_ => "alpha") ++ (1 to 80).map(_ => "beta") ++
      (1 to 5).map(i => s"rare$i")).toDF("w").repartition(16)
    val hh = df.agg(HeavyHitters.heavyHitters(col("w"), 8).as("hh"))
      .select(explode(col("hh")).as(Seq("item", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // k=8 > 7 distinct items: no evictions anywhere, counts are EXACT
    assert(hh("alpha") == 100L && hh("beta") == 80L)
    assert((1 to 5).forall(i => hh(s"rare$i") == 1L))
  }

  test("non-string input fails analysis with a clear type error") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("x")
    val err = intercept[Exception] {
      df.agg(HeavyHitters.heavyHitters(col("x"), 8)).collect()
    }
    assert(err.getMessage.contains("heavy_hitters takes a string column"))
  }
}

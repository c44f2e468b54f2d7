package graft

import org.apache.spark.sql.functions._

/** Pins the null-handling contracts the engine relies on (and that the
  * reference's quirks interact with — SURVEY.md §2.2.3). */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val withNulls =
    Seq((Some(1L), "a"), (None, "b"), (Some(1L), "c"), (None, "d"))
      .toDF("k", "v")

  test("equi-joins never match null keys (reference drops them; Spark agrees)") {
    val other = Seq((Option.empty[Long], "x"), (Some(1L), "y")).toDF("k2", "w")
    val joined = withNulls.join(other, col("k") === col("k2"))
    assert(joined.count() == 2) // only the k=1 rows match; null==null is not true
  }

  test("groupBy keeps a null group but count(col) skips nulls") {
    val g = withNulls.groupBy("k")
      .agg(count(lit(1)).as("rows"), count(col("k")).as("nonnull"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(g(1L) == (2L, 2L))
    assert(g(-1L) == (2L, 0L)) // null group exists; count(k) is 0 there
  }

  test("null-safe equality (<=>): matches null keys when explicitly requested") {
    val other = Seq((Option.empty[Long], "x")).toDF("k2", "w")
    val nsJoin = withNulls.join(other, col("k") <=> col("k2"))
    assert(nsJoin.count() == 2) // the two null-k rows match the null k2
  }

  test("sort order: nulls first ascending, last descending (Spark default)") {
    val asc = withNulls.orderBy(col("k").asc).select("k").collect()
    assert(asc.head.isNullAt(0))
    val desc = withNulls.orderBy(col("k").desc).select("k").collect()
    assert(desc.last.isNullAt(0))
  }
}

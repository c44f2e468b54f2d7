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

  test("span operators: null text behaves like an empty document, never crashes") {
    val d = Seq((1L, Option("alpha beta gamma delta epsilon zeta eta theta x")),
        (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val spans = graft.operators.Corpus.repeatedSpans(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null text -> null token array -> size() is -1 under legacy=false?
    // PINNED: greatest(size-7, 0) floors it to zero windows either way
    assert(spans(2L) == 0L)
    val rm = graft.operators.Corpus.removeRepeatedSpans(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(4)))).toMap
    assert(rm(2L) == ((0L, "")))
  }

  test("tokenBudgetMix: null text and null source rows drop out deterministically") {
    val d = Seq(
      (1L, Option("the the the solid words here"), Option("s1")),
      (2L, Option.empty[String], Option("s1")),   // null text: no quality
      (3L, Option("the the good text ok fine"), Option.empty[String])
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Corpus.tokenBudgetMix(d, budget = 100).collect()
    // null text -> null quality/est_tokens -> null cum <= budget is null -> dropped;
    // null source forms its OWN window group (groupBy semantics) and survives
    val ids = out.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
    assert(out.find(_.getLong(0) == 3L).get.isNullAt(1)) // source stays null
  }
}

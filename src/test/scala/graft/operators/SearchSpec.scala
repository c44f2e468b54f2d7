package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("collocations: PMI hand-check on a tiny corpus") {
    // 12 tokens, 10 bigrams; pair counts ab=3, ba=2, cc=5
    //   PMI(a,b) = ln(3/10) - ln(3/12) - ln(3/12) = 1.568616
    //   PMI(c,c) = ln(5/10) - 2 ln(6/12)          = 0.693147
    val docs = Seq((1L, "a b a b a b"), (2L, "c c c c c c"))
      .toDF("doc_id", "text")
    val got = Search.collocations(docs, minCount = 3, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", "b", 3L, 1.568616),
      ("c", "c", 5L, 0.693147)))
  }

  test("collocations: minCount prunes rare pairs") {
    val docs = Seq((1L, "a b a b a b"), (2L, "c c c c c c"))
      .toDF("doc_id", "text")
    val pairs = Search.collocations(docs, minCount = 1, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b"), ("b", "a"), ("c", "c")))
  }

  test("collocations: one-token and null docs yield no bigrams, never crash") {
    val docs = Seq((1L, Option("solo")), (2L, Option.empty[String]),
        (3L, Option("   ")))
      .toDF("doc_id", "text")
    assert(Search.collocations(docs, minCount = 1).collect().isEmpty)
  }
}

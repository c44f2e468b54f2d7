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

  test("postings: impact ordering, df/cf, and the top-k cut") {
    // term "a": doc1 tf=3, doc2 tf=1, doc3 tf=2 -> postings ranked 1,3,2;
    // with k=2 only docs 1 and 3 survive; df=3, cf=6
    val docs = Seq((1L, "a a a b"), (2L, "a b"), (3L, "a a"))
      .toDF("doc_id", "text")
    val got = Search.postings(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.filter(_._1 == "a").toSeq == Seq(
      ("a", 3L, 6L, 1L, 1L, 3L),
      ("a", 3L, 6L, 2L, 3L, 2L)))
    assert(got.filter(_._1 == "b").toSeq == Seq(
      ("b", 2L, 2L, 1L, 1L, 1L),
      ("b", 2L, 2L, 2L, 2L, 1L)))
  }

  test("collocations: one-token and null docs yield no bigrams, never crash") {
    val docs = Seq((1L, Option("solo")), (2L, Option.empty[String]),
        (3L, Option("   ")))
      .toDF("doc_id", "text")
    assert(Search.collocations(docs, minCount = 1).collect().isEmpty)
  }

  test("rrfFuse: hand-checked fusion of two overlapping rankings") {
    import spark.implicits._
    // list A ranks (10, 20, 30); list B ranks (20, 10, 40): doc 10 and 20
    // appear in both lists, 30/40 in one each
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id", "rank")
    val got = Search.rrfFuse(Seq(a, b), kRrf = 60, topK = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def t(rank: Long): Double =
      BigDecimal(1.0 / (60 + rank)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 10: ranks 1+2; doc 20: ranks 2+1 (tie on score, id breaks it);
    // then the singletons by their single terms
    assert(got.map(_._1).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(math.abs(got(0)._2 - (t(1) + t(2))) < 1e-9)
    assert(math.abs(got(1)._2 - (t(1) + t(2))) < 1e-9)
    assert(got(0)._3 == 2L && got(2)._3 == 1L)
    assert(math.abs(got(2)._2 - t(3)) < 1e-9)
  }
}

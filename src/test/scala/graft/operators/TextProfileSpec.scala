package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextProfileSpec extends SparkSpec {

  test("perplexityBuckets: value-monotone buckets, ties to lower, full coverage") {
    val docs = Tables.load(spark, sf, "documents")
    val out = TextProfile.perplexityBuckets(docs).cache()
    val scored = TextProfile.trigramLmScore(docs)
    // every LM-scored doc gets exactly one bucket
    assert(out.count() == scored.count())
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    val byBucket = out.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("avg_lnp").as("lo"), max("avg_lnp").as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // threshold assignment makes buckets strictly ordered by value:
    // a middle doc tied with tail's max would itself be tail
    assert(byBucket("tail")._3 < byBucket("middle")._2)
    assert(byBucket("middle")._3 < byBucket("head")._2)
    // sampled terciles put a nontrivial share in each stratum (the
    // 30% sample of this corpus is ~150 docs; edges cannot degenerate)
    val n = out.count().toDouble
    Seq("head", "middle", "tail").foreach { b =>
      assert(byBucket(b)._1 > n * 0.1, s"$b stratum collapsed: ${byBucket(b)._1}")
    }
    out.unpersist()
  }

  test("perplexityBuckets: junk text ranks below fluent text") {
    import spark.implicits._
    // fluent docs share trigram mass; the junk doc's trigrams are rare →
    // lowest avg log-prob in the corpus, so it can never land in head
    val fluent = (1L to 12L).map(i => (i, "the cat sat on the mat near the hat"))
    val junk = Seq((99L, "zq xv jw qk zx vj wq kz xq vz"))
    val d = (fluent ++ junk).toDF("doc_id", "text")
    val out = TextProfile.perplexityBuckets(d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(99L) == "tail")
    assert(out.size == 13)
  }

  test("canonicalize folds case, accents, punctuation and whitespace") {
    import spark.implicits._
    val d = Seq(
      (1L, Option("Héllo,  Wörld!")),
      (2L, Option("hello world")),
      (3L, Option("  HELLO\tWORLD.\n")),
      (4L, Option.empty[String]),
      (5L, Option("!!!")))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"), TextProfile.canonicalize(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "hello world")
    assert(got(2L) == "hello world")
    assert(got(3L) == "hello world")
    assert(got(4L) == "")   // null folds to the empty document
    assert(got(5L) == "")
  }
}

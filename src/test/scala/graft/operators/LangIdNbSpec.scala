package graft.operators

import graft.{SparkSpec, Tables}
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

class LangIdNbSpec extends SparkSpec {

  test("q134: one prediction per doc, candidates from the training langs, scores finite") {
    val docs = Tables.load(spark, sf, "documents")
    val out = TextQueries.q134LangIdNb(spark, sf).cache()
    try {
      assert(out.count() == docs.count(),
        "every document (all are >= 3 chars here) must get one prediction")
      assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
      val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
      val preds = out.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
      assert(preds.subsetOf(langs), s"predicted unknown language: ${preds -- langs}")
      // log-probabilities: strictly negative and finite
      assert(out.filter(col("score") >= 0 || isnan(col("score"))).count() == 0)
      // is_correct is consistent with its columns
      assert(out.filter(col("is_correct") =!=
        (col("pred_lang") === col("lang"))).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("q134: argmax is stable across recomputation (content-addressed, no RNG)") {
    val a = TextQueries.q134LangIdNb(spark, sf)
    val b = TextQueries.q134LangIdNb(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q145: the incremental model store's predictions equal from-scratch q134") {
    val inc = TextQueries.q145IncrementalLangModel(spark, sf)
    val batch = TextQueries.q134LangIdNb(spark, sf)
    assert(inc.count() > 0)
    assert(inc.exceptAll(batch).isEmpty && batch.exceptAll(inc).isEmpty,
      "accumulated additive counts must rebuild the one-shot model bit-equal")
  }

  test("q138: margin gate partitions docs; confident rows keep q134's argmax") {
    val out = TextQueries.q138LangIdConfident(spark, sf).cache()
    try {
      // the gate is non-vacuous at this SF: both buckets populated
      assert(out.filter(col("pred_lang") === "unknown").count() > 0)
      assert(out.filter(col("pred_lang") =!= "unknown").count() > 0)
      // margin is a top-1 minus top-2 score: strictly positive (a tie at
      // exactly 0 is possible in principle, never negative)
      assert(out.filter(col("margin") < 0).count() == 0)
      // flag and bucket agree: unknown <=> not confident
      assert(out.filter(col("is_confident") =!=
        (col("pred_lang") =!= "unknown")).count() == 0)
      // a confident prediction IS q134's argmax for that doc
      val argmax = TextQueries.q134LangIdNb(spark, sf)
        .select(col("doc_id"), col("pred_lang").as("am"))
      assert(out.filter(col("is_confident")).join(argmax, "doc_id")
        .filter(col("pred_lang") =!= col("am")).count() == 0)
      // raising the threshold only shrinks the confident set (monotone dial)
      val strict = TextQueries.langIdConfident(spark, sf, minMargin = 10.0)
      assert(strict.filter(col("is_confident")).count() <
        out.filter(col("is_confident")).count())
    } finally { out.unpersist(); () }
  }

  test("q139: fused pipeline covers exactly the confident survivors") {
    val surv = TextQueries.q138LangIdConfident(spark, sf)
      .filter(col("is_confident"))
      .select(col("doc_id"), col("pred_lang"))
    val out = TextQueries.q139CcnetPipeline(spark, sf).cache()
    try {
      // one bucket row per survivor (every fixture doc has >= 3 chars),
      // with the survivor's own predicted language carried through
      assert(out.select("doc_id", "pred_lang").exceptAll(surv).isEmpty)
      assert(surv.exceptAll(out.select("doc_id", "pred_lang")).isEmpty)
      val buckets = out.select("bucket").distinct()
        .collect().map(_.getString(0)).toSet
      assert(buckets.subsetOf(Set("head", "middle", "tail")))
      // terciles over the survivor sample: all three strata appear
      assert(buckets.size == 3, s"expected all three buckets, got $buckets")
    } finally { out.unpersist(); () }
  }
}

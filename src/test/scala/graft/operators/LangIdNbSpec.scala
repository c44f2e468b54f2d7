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
}

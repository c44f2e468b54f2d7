package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PQSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("codebook: 16 centroids x 64 dims; codes: one per (vector, subspace), in [0,16)") {
    val cb = PQ.codebook(emb)
    assert(cb.count() == 16L * 64)
    val codes = PQ.encode(emb, cb)
    assert(codes.count() == emb.count() * 8)
    assert(codes.filter(col("code") < 0 || col("code") >= 16).count() == 0)
  }

  test("every codebook donor encodes to itself (zero reconstruction error)") {
    val cb = PQ.codebook(emb)
    val codes = PQ.encode(emb, cb)
    // replicate the content-addressed seed selection to find the donors
    val seeds = emb.select(col("vec_id"),
        graft.functions.Fnv64.fnv64(col("vec_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("vec_id")).limit(16).select(col("vec_id"))
    val dims = emb.select(col("vec_id").as("id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("id"), col("dim"), col("x").cast("double").as("x"))
    // reconstruct each seed from its codes; a donor's subvectors ARE
    // centroids, so the argmin must pick them (d2 = 0 beats everything)
    val rec = codes.join(seeds, codes("id") === seeds("vec_id"))
      .join(cb.withColumnRenamed("cid", "code")
          .withColumn("m", (col("dim") / 8).cast("int")),
        Seq("code", "m"))
      .join(dims, Seq("id", "dim"))
      .groupBy(col("id"))
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("err"))
    assert(rec.count() == 16)
    assert(rec.filter(col("err") > 1e-12).count() == 0,
      "a codebook donor must quantize to exactly its own subvectors")
  }

  test("ADC top-k: self-free, exactly k per query, deterministic across runs") {
    val top = PQ.adcTopK(emb, col("vec_id") < 10, 3).cache()
    assert(top.filter(col("qid") === col("cid")).count() == 0)
    assert(top.groupBy("qid").count().filter(col("count") =!= 3).count() == 0)
    val again = PQ.adcTopK(emb, col("vec_id") < 10, 3)
    assert(top.exceptAll(again).isEmpty && again.exceptAll(top).isEmpty)
  }

  test("ADC plan: codebook and query table broadcast, DB vectors never pair") {
    val plan = PQ.adcTopK(emb, col("vec_id") < 10, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    // the only window is the per-query rank (partitioned by qid) — the
    // seed-numbering window is gone (round 6)
    assert(!plan.contains("Window [") ||
      plan.contains("windowspecdefinition(qid"), plan.take(2000))
  }
}

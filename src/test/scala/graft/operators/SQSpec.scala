package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SQSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("codes stay in [0, 255] and reconstruction error is within half a step") {
    val grid = SQ.stats(emb)
    val codes = SQ.encode(emb, grid)
    val rng = codes.agg(min(col("code")), max(col("code"))).head()
    assert(rng.getInt(0) >= 0 && rng.getInt(1) <= 255)
    // |x − x̂| ≤ span/255/2 + ulp slack: the affine grid's half-step bound
    val bad = SQ.reconstruct(codes, grid)
      .join(SQ.dims(emb, "vec_id", "embedding"), Seq("id", "dim"))
      .join(grid, Seq("dim"))
      .filter(abs(col("x") - col("xh")) > col("span") / 255d / 2d + 1e-9)
      .count()
    assert(bad == 0L, s"$bad components exceed the half-step bound")
  }

  test("a constant dimension quantizes to code 0 and reconstructs exactly") {
    import spark.implicits._
    val df = Seq((1L, Array(0.5f, 1.0f)), (2L, Array(0.5f, 3.0f)))
      .toDF("vec_id", "embedding")
    val grid = SQ.stats(df)
    val rec = SQ.reconstruct(SQ.encode(df, grid), grid)
      .filter(col("dim") === 0).collect()
    assert(rec.forall(_.getDouble(2) == 0.5))
  }

  test("a planted exact duplicate is served at rank 1 with cosine ≈ 1") {
    val base = emb.select(col("vec_id"), col("embedding"))
    val dup = base.filter(col("vec_id") === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val aug = base.unionAll(dup)
    val grid = SQ.stats(aug)
    val rec = SQ.reconstruct(SQ.encode(aug, grid), grid)
    val top = SQ.search(emb.filter(col("vec_id") === 0), rec, 1)
      .head()
    assert(top.getLong(2) == 1000000L, s"rank-1 should be the dup: $top")
    assert(top.getDouble(3) > 0.9999, s"dup cosine should be ≈1: $top")
  }
}

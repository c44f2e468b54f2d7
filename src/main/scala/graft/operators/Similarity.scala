package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column, built from codegen'd higher-order functions (zip_with/aggregate) —
  * no UDFs in the hot path.
  *
  * All float elements are cast to double BEFORE multiplication so the
  * arithmetic is double-precision end to end (and bit-matches the DuckDB
  * oracle, which does the same); scores are rounded to 6 decimals and ties
  * broken by candidate id, making rankings engine-independent.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, summed in index order (native codegen'd
    * expression — the zip_with/aggregate HOF formulation is CodegenFallback
    * and ~10× slower in the all-pairs hot loop). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dotF(a, b)

  def norm(a: Column): Column = graft.functions.VectorExpressions.normF(a)

  /** Exact top-k cosine neighbors for each query vector — the correctness
    * baseline. The query side must be small (it is broadcast); candidates
    * stream through executors, so the cost is |Q|·|C| dot products with no
    * shuffle of the candidate table beyond the final per-query top-k. */
  def knnBrute(queries: DataFrame, candidates: DataFrame, kNeighbors: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"),
      norm(col(vecCol)).as("qn"))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("ce"),
      norm(col(vecCol)).as("cn"))
    val scored = broadcast(q).join(c, col("qid") =!= col("cid"))
      .withColumn("cosine", round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("cid"), col("cosine"))
  }

  /** IVF-style ANN: partition candidates into `nCells` buckets by a
    * deterministic random-hyperplane sign signature (seeded hashes, no RNG
    * state), probe only the query's own bucket plus `nProbe-1` mirror
    * buckets. Scale path: each query scores |C|/nCells · nProbe candidates
    * instead of |C|. Recall is approximate by construction; exactness is
    * knnBrute's job. */
  def knnLsh(queries: DataFrame, candidates: DataFrame, kNeighbors: Int = 3,
      nPlanes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def signBits(vec: Column): Column = {
      // plane p, dim i weight = deterministic hash in [-0.5, 0.5)
      val projections = (0 until nPlanes).map { p =>
        aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
            x.cast("double") *
              ((pmod(xxhash64(concat_ws("_", lit(p).cast("string"), i.cast("string"))),
                lit(1000000L)).cast("double") / 1000000.0) - 0.5)),
          lit(0.0), (acc, v) => acc + v)
      }
      (0 until nPlanes).map(p => when(projections(p) > 0, 1 << p).otherwise(0))
        .reduce(_ + _)
    }
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"),
      norm(col(vecCol)).as("qn"), signBits(col(vecCol)).as("bucket"))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("ce"),
      norm(col(vecCol)).as("cn"), signBits(col(vecCol)).as("bucket"))
    val scored = broadcast(q).join(c,
        col("qid") =!= col("cid") && q("bucket") === c("bucket"))
      .withColumn("cosine", round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("cid"), col("cosine"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, a < b. Brute
    * pairwise at audit scale; compose with knnLsh buckets for the scale path. */
  def cosineNearDup(embeddings: DataFrame, threshold: Double = 0.95,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("e"),
      norm(col(vecCol)).as("n"))
    val a = e.select(col("id").as("a_id"), col("e").as("ae"), col("n").as("an"))
    val b = e.select(col("id").as("b_id"), col("e").as("be"), col("n").as("bn"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cosine", round(dot(col("ae"), col("be")) / (col("an") * col("bn")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }
}

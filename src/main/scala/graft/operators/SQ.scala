package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-dimension affine scalar quantization (SQ8) for embedding search —
  * the third index family next to PQ (q96) and IVF (q44/q127/q133), and the
  * FAISS `SQ8` layout (Johnson, Douze & Jégou, "Billion-scale similarity
  * search with GPUs", 2017): each dimension d gets a trained range
  * [mn_d, mn_d + span_d]; every component is stored as one uint8 code
  * `floor((x − mn_d) / span_d · 255 + 0.5)`, cutting memory 4× versus
  * float32 with far less distortion than PQ's 32× (a different point on the
  * recall/memory curve — SQ8 is what production fleets use when vectors
  * must stay "almost exact" but float32 doesn't fit).
  *
  * Unlike [[graft.functions.VectorExpressions.quant8F]] — a per-VECTOR
  * symmetric int8 signature used for exact-dup detection — SQ8 trains the
  * grid per DIMENSION over the corpus and serves ASYMMETRICALLY: the query
  * stays exact and scores against reconstructed codes, so query-side
  * precision is never lost (the ADC idea applied to scalar codes).
  *
  * Determinism: the trained range is a MIN/MAX selection (no summation —
  * exact in any engine); the encode arithmetic is a fixed IEEE expression
  * tree replayed verbatim by the oracle; serve-side dot products and norms
  * are per-term-rounded to 12 decimals and DECIMAL-summed (the repo-wide
  * order-proof convention).
  *
  * Scale shape: training is ONE dim-keyed aggregate (D output rows,
  * broadcast back); encode is scan-local against the broadcast grid; serve
  * for a bounded query set is a broadcast-join scan over codes with one
  * (qid, cid) aggregate — never db-vector × db-vector.
  */
object SQ {

  /** Exploded (id, dim, x) component rows — the row form every SQ stage
    * shares. */
  private[operators] def dims(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("dim"), col("x").cast("double").as("x"))

  /** Trained per-dimension grid: (dim, mn, span). A constant dimension
    * (span 0) still gets a row — encode maps it to code 0 and reconstruct
    * returns mn exactly. */
  def stats(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    dims(emb, idCol, vecCol)
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .select(col("dim"), col("mn"), (col("mx") - col("mn")).as("span"))

  /** uint8 codes, row form (id, dim, code). `floor(t + 0.5)` rather than
    * `round` so the DuckDB oracle replays the exact same half-up cut on the
    * exact same IEEE double (Spark's round on doubles goes through
    * BigDecimal HALF_UP — equivalent here, but floor is the formulation
    * both engines parse into the identical expression tree). Codes are
    * SATURATED into [0, 255] (the FAISS SQ8 rule): a no-op when the grid
    * was trained on the corpus being encoded (min/max cover every x), but
    * load-bearing for the incremental store ([[IncrementalSQ]]), where a
    * grid frozen at init encodes later dates whose components may fall
    * outside the trained range. */
  def encode(emb: DataFrame, grid: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    dims(emb, idCol, vecCol)
      .join(broadcast(grid), Seq("dim"))
      .select(col("id"), col("dim"),
        when(col("span") === 0d, lit(0))
          .otherwise(greatest(lit(0), least(lit(255),
            floor((col("x") - col("mn")) / col("span") * lit(255d)
              + lit(0.5d)).cast("int"))))
          .cast("int").as("code"))

  /** Reconstructed components (id, dim, xh): the grid point the code names.
    * Kept in row form — the serve join needs (dim)-keyed rows, and the
    * decimal-summed norm wants per-term rounding anyway. */
  def reconstruct(codes: DataFrame, grid: DataFrame): DataFrame =
    codes.join(broadcast(grid), Seq("dim"))
      .select(col("id"), col("dim"),
        (col("mn") + col("code").cast("double") / lit(255d) * col("span"))
          .as("xh"))

  /** Asymmetric top-k cosine serve: exact `queries` against the
    * reconstructed corpus. Output (qid, rank, cid, cosine), rank ties by
    * cid. Queries must be a bounded set (they are broadcast, the corpus is
    * scanned once). */
  def search(queries: DataFrame, recon: DataFrame, kNeighbors: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qd = dims(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("dim"), col("x").as("qx"))
    def dnorm(df: DataFrame, id: String, x: String, out: String): DataFrame =
      df.groupBy(col(id))
        .agg(sqrt(sum(round(col(x) * col(x), 12).cast("decimal(28,12)"))
          .cast("double")).as(out))
    val qn = dnorm(qd, "qid", "qx", "qn")
    val cn = dnorm(recon, "id", "xh", "cn")
    val dots = recon.join(broadcast(qd), Seq("dim"))
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid"), col("id").as("cid"))
      .agg(sum(round(col("qx") * col("xh"), 12).cast("decimal(28,12)"))
        .cast("double").as("dot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    dots.join(broadcast(qn), Seq("qid")).join(cn.withColumnRenamed("id", "cid"), Seq("cid"))
      .withColumn("cosine", round(col("dot") / (col("qn") * col("cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("cid"),
        col("cosine"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding search (Jégou, Douze & Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): split
  * each D-dim vector into M subvectors, quantize each against a per-
  * subspace codebook of K centroids, and answer queries with ADC
  * (asymmetric distance computation) — the query's EXACT per-centroid
  * subdistance table, summed along each database vector's M stored codes.
  * Memory per vector drops from D floats to M small codes (here 8 codes ≈
  * 8 bytes vs 256 — the compression that lets a 100 TB ANN index fit an
  * executor fleet), at the cost of quantization error in the distances.
  *
  * Codebook "training" is CONTENT-ADDRESSED seeding (the q44/q56
  * convention): the K vectors with the smallest FNV-1a(id) hashes donate
  * their subvectors as centroids — a pure function of the data, no RNG, no
  * iteration — so the entire pipeline (codebook, code assignment, ADC
  * ranking) is closed-form and a SQL oracle replays it bit-exactly.
  * Production would run a few Lloyd rounds per subspace to tighten the
  * cells; the operator contract (codes, ADC, ranking) is identical.
  *
  * Determinism: every distance is per-dimension-rounded to 12 decimals and
  * summed through DECIMAL (the repo-wide order-proof convention);
  * argmin/rank tie-breaks are (distance, centroid id) / (distance, vec id).
  *
  * Scale shape: codes are computed scan-side against a BROADCAST codebook
  * (K·D doubles — tiny) with one (id, m)-keyed aggregate; the query
  * distance-table join broadcasts Q·M·K rows; nothing ever pairs database
  * vectors with each other.
  */
object PQ {

  /** (cid, m, dim, c) centroid component rows: the K hash-least vectors'
    * subvectors, one row per centroid component. Seed selection+numbering
    * shared with [[KMeans.hashSeeds]] (windowless — see its note). */
  def codebook(emb: DataFrame, k: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    KMeans.hashSeeds(emb, k, idCol, vecCol)
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "c")))
      .select(col("cid"), col("dim"), col("c").cast("double").as("c"))

  /** Exact squared L2 between every (vector subspace, centroid subspace)
    * pair: (id, m, cid, d2) with d2 an exact DECIMAL of per-dim-rounded
    * terms. `subDim` = D / M. */
  private[operators] def subDistances(vecs: DataFrame, cb: DataFrame, subDim: Int,
      idCol: String, vecCol: String): DataFrame = {
    val dims = vecs.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), (col("dim") / subDim).cast("int").as("m"),
        col("dim"), col("x").cast("double").as("x"))
    val diff = col("x") - col("c")
    dims.join(broadcast(cb), Seq("dim"))
      .groupBy(col("id"), col("m"), col("cid"))
      .agg(sum(round(diff * diff, 12).cast("decimal(28,12)")).as("d2"))
  }

  /** PQ codes: (id, m, code) — per subspace, the centroid minimizing the
    * exact subdistance (ties → smaller cid).
    *
    * PER-ROW since the optimization round: the codebook is K·D doubles
    * (bounded driver metadata — collected here), so encoding is one
    * scan-local projection ([[graft.functions.ModelExpressions.PqCodesF]])
    * plus an explode of the M-code array — ZERO exchanges, where the old
    * plan paid explode→broadcast-join→two hash aggregates (2 exchanges)
    * per encode. Arithmetic is bit-identical (same round-12 decimal
    * subdistances, same (d2, cid) argmin) — oracle-gated across
    * q96/q133/q96-adjacent paths. */
  def encode(emb: DataFrame, cb: DataFrame, m: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    encodeByModel(emb, graft.functions.ModelExpressions.collectModel(cb),
      vecDim(emb, vecCol), m, idCol, vecCol)

  /** [[encode]] against an already-collected codebook model. */
  private[operators] def encodeByModel(emb: DataFrame,
      model: graft.functions.ModelExpressions.VectorModel, dim: Int, m: Int,
      idCol: String, vecCol: String): DataFrame = {
    require(dim % m == 0, s"dim $dim must be a multiple of m=$m")
    emb.select(col(idCol).as("id"),
        explode(graft.functions.ModelExpressions
          .pqCodesF(col(vecCol), model, dim / m)).as("mc"))
      .select(col("id"), col("mc.m").as("m"), col("mc.code").as("code"))
  }

  private[operators] def vecDim(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol))).head().getInt(0)

  /** ADC top-k: for each query (vectors with `queryPred`), the exact
    * per-subspace distance table to all centroids, summed along every
    * database vector's codes; self-pairs excluded; ranked by (approx
    * distance, candidate id). Output (qid, rank, cid, adist). */
  def adcTopK(emb: DataFrame, queryPred: Column, topK: Int = 3, m: Int = 8,
      k: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // collect the codebook ONCE (K·D doubles): the encode runs per-row
    // against the model, and the query-side distance table reads the same
    // collected rows as a LocalTableScan instead of recomputing the
    // hash-seed scan in its own subtree
    val model = graft.functions.ModelExpressions
      .collectModel(codebook(emb, k, idCol, vecCol))
    val cb = KMeans.localCentroids(emb.sparkSession, model)
    val dim = vecDim(emb, vecCol)
    val codes = encodeByModel(emb, model, dim, m, idCol, vecCol)
    val qd = subDistances(emb.filter(queryPred), cb, dim / m, idCol, vecCol)
      .select(col("id").as("qid"), col("m"), col("cid"), col("d2"))
    val adist = codes.join(broadcast(qd),
        qd("m") === codes("m") && qd("cid") === codes("code") &&
          qd("qid") =!= codes("id"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d2")).as("ad")) // DECIMAL sum of M exact terms
    val w = Window.partitionBy(col("qid")).orderBy(col("ad"), col("id"))
    adist.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank").cast("bigint").as("rank"),
        col("id").as("cid"), round(col("ad").cast("double"), 6).as("adist"))
  }
}

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

  /** Deterministic hyperplane weight for LSH plane `p`, dimension `i`
    * (splitmix64 bit-mix → uniform in [-0.5, 0.5)). Public so the DuckDB
    * oracle can replay the exact bucket assignment (SparkEntry builds the
    * q31 oracle SQL from these same values). */
  def hyperplaneWeight(p: Int, i: Int): Float = {
    var z = (p.toLong << 32 | i.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    ((z >>> 11).toDouble / (1L << 53).toDouble - 0.5).toFloat
  }

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

  /** LSH/IVF-style ANN: candidates are bucketed by a deterministic
    * random-hyperplane sign signature (seeded hashes, no RNG state); each
    * query multi-probes its own bucket plus every Hamming-1 neighbor bucket
    * (nPlanes+1 probes). Scale path: each query scores
    * ≈|C|·(nPlanes+1)/2^nPlanes candidates instead of |C|. Recall is
    * approximate by construction; exactness is knnBrute's job. */
  def knnLsh(queries: DataFrame, candidates: DataFrame, kNeighbors: Int = 3,
      nPlanes: Int = 8, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // deterministic hyperplane weights (splitmix64 per (plane, dim)),
    // materialized as literal arrays so the projection is one native DotF
    // per plane inside whole-stage codegen (dims beyond `maxDim` ignored —
    // DotF sums over the shorter array)
    val maxDim = 1024
    val planes: Seq[Column] = (0 until nPlanes).map { p =>
      typedlit(Array.tabulate(maxDim)(i => hyperplaneWeight(p, i)))
    }
    def signBits(vec: Column): Column =
      (0 until nPlanes).map(p =>
        when(graft.functions.VectorExpressions.dotF(vec, planes(p)) > 0, 1 << p)
          .otherwise(0))
        .reduce(_ + _)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"),
      norm(col(vecCol)).as("qn"), signBits(col(vecCol)).as("bucket"))
      .withColumn("probe", explode(array(
        (Seq(col("bucket")) ++
          (0 until nPlanes).map(p => col("bucket").bitwiseXOR(lit(1 << p)))): _*)))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("ce"),
      norm(col(vecCol)).as("cn"), signBits(col(vecCol)).as("bucket"))
    val scored = broadcast(q).join(c,
        col("qid") =!= col("cid") && col("probe") === c("bucket"))
      .withColumn("cosine", round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("qid"), col("rank").cast("bigint").as("rank"), col("cid"), col("cosine"))
  }

  /** IVF ANN: a k-means coarse quantizer (deterministic seed) buckets the
    * candidates; each query probes its `nProbe` nearest centroids and scores
    * only those cells — ≈|C|·nProbe/nCells work per query. The right ANN
    * shape for clustered embeddings (hyperplane LSH needs tight angular
    * clusters; IVF only needs any cluster structure). Build phase is one
    * k-means fit over a seeded SAMPLE of the candidates (`fitFraction`),
    * with only the tiny centroid table broadcast — the 100 TB shape. */
  def knnIvf(queries: DataFrame, candidates: DataFrame, kNeighbors: Int = 3,
      nCells: Int = 16, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      fitFraction: Double = 0.5): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val cdf = candidates.select(col(idCol).as("cid"), col(vecCol).as("ce"),
      norm(col(vecCol)).as("cn"),
      array_to_vector(col(vecCol)).as("__fv"))
    // Quantizer fit on a seeded sample, never the full candidate table — at
    // 100 TB the fit reads a bounded fraction and only the (nCells × dim)
    // centroid table is broadcast. Pick fitFraction ≈ targetFitRows/|C|.
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("__fv").setPredictionCol("cell")
      .fit(cdf.sample(withReplacement = false, fitFraction, seed = 42L))
    val assigned = model.transform(cdf).drop("__fv")

    // tiny (nCells × dim) centroid table — broadcast side of every join
    val spark = candidates.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")

    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"),
      norm(col(vecCol)).as("qn"))
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(col("cdist"), col("cell"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", dot(col("qe"), col("centroid")) * -1 / col("qn"))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nProbe)
      .select(col("qid"), col("qe"), col("qn"), col("cell"))

    val scored = broadcast(probes).join(assigned,
        col("qid") =!= col("cid") && probes("cell") === assigned("cell"))
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

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental SEMANTIC (embedding) near-dup store — the
  * [[IncrementalDedup]] shape for the hyperplane-banded family: each
  * ingestion date computes sign-bit band hashes for ITS OWN embeddings
  * once ([[Similarity.hyperplaneBandHashes]] — literally the batch q93
  * construction, so candidate recall can never diverge from it), appends
  * them to a persistent store, and band-joins the new rows against the
  * accumulated store. Old vectors are never re-hashed; the daily join is
  * exchange-free on both sides (bucket-aligned). Where the MinHash store
  * can only SCORE candidates from signatures, this family verifies with
  * EXACT cosine — the vectors ride in a second id-bucketed table, so
  * verification reads the store, never the source corpus.
  *
  * Store layout per base name `t`:
  *  - `t_cfg` — the FROZEN banding model (nPlanes, r, dim): band hashes
  *    must be comparable across dates, so the width law is applied ONCE
  *    at init against the HORIZON corpus size (the frozen-quantizer
  *    rule; the batch path's plan-time self-sizing would silently change
  *    r as the store grows and orphan every earlier date's hashes);
  *  - `t_bands` — (band, bh, id) per date, BUCKETED ON (band, bh): the
  *    new-day × store candidate join reads both sides bucket-aligned
  *    with zero exchanges (the [[IncrementalDedup.newPairsBucketed]]
  *    property);
  *  - `t_vecs` — (id, e, n) per date, BUCKETED ON id: exact-cosine
  *    verification gathers both endpoints of the (banded, sub-quadratic)
  *    candidate stream from here; the vector table itself never
  *    reshuffles — only candidate-mass-sized key streams move.
  *
  * Band hashes are a pure per-row function of (vector, frozen config),
  * so the union of per-date [[newPairs]] outputs equals the one-shot
  * batch [[Similarity.cosineNearDupBanded]] pairs over the union corpus
  * with the same width (spec-pinned; oracle-gated as q178 against the
  * EXACT all-pairs SQL — a green hash is recall = 1.0 for the
  * incremental path). Deletion propagates through the shared contract
  * ([[deleteIds]]); a re-run date drops its partitions first
  * ([[dropDate]]). `nBuckets` is fixed for the table's life. */
object IncrementalSemantic {

  /** Freeze the banding model: r from the width law at the HORIZON
    * corpus size (pass the size the store is expected to reach — at
    * 100 TB that is a capacity-planning number, not a measurement), dim
    * probed from the initial slice. Overwrite = re-init is a new store. */
  def initModel(initial: DataFrame, table: String, horizonRows: Long,
      nPlanes: Int = 128, vecCol: String = "embedding"): Unit = {
    val spark = initial.sparkSession
    import spark.implicits._
    val r = Similarity.derivedRowsPerBand(horizonRows, nPlanes)
    Seq((nPlanes, r, Similarity.vectorDim(initial, vecCol)))
      .toDF("nPlanes", "r", "dim")
      .write.mode("overwrite").saveAsTable(s"${table}_cfg")
  }

  private def cfg(spark: SparkSession, table: String): (Int, Int, Int) = {
    // bounded metadata read: the 1-row frozen banding config
    val row = spark.table(s"${table}_cfg").head()
    (row.getInt(0), row.getInt(1), row.getInt(2))
  }

  /** Hash one date's embeddings against the frozen config and append:
    * band rows to the (band, bh)-bucketed table, (id, vector, norm) rows
    * to the id-bucketed table. The expensive work (nPlanes sign dots per
    * vector) happens here once per row, ever. */
  def appendDate(emb: DataFrame, table: String, date: String,
      nBuckets: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    val (nPlanes, r, dim) = cfg(spark, table)
    IncrementalStore.appendBucketed(
      emb.select(col(idCol).as("id"),
          posexplode(Similarity.hyperplaneBandHashes(
            col(vecCol), nPlanes, r, level = 0, maxDim = dim))
            .as(Seq("band", "bh")))
        .select(col("band"), col("bh"), col("id")),
      s"${table}_bands", date, Seq("band", "bh"), nBuckets)
    IncrementalStore.appendBucketed(
      emb.select(col(idCol).as("id"), col(vecCol).as("e"),
        Similarity.norm(col(vecCol)).as("n")),
      s"${table}_vecs", date, Seq("id"), nBuckets)
  }

  /** Exact-cosine near-dup pairs INVOLVING date `date`: the new day's
    * band rows join the accumulated store on (band, bh) — exchange-free,
    * both sides bucket-aligned — and the candidate stream (banded,
    * sub-quadratic) is verified by exact cosine from the vector table.
    * Emits (a_id, b_id, cosine) with a_id < b_id, each unordered pair
    * once; the union over every ingested date is the full batch pair
    * set (each pair surfaces when its LATER endpoint arrives). */
  def newPairs(spark: SparkSession, table: String, date: String,
      threshold: Double = 0.9): DataFrame = {
    val bands = IncrementalStore.consistentScan(spark, s"${table}_bands")
    val fresh = bands.filter(col("ds") === date)
    val candidates = fresh.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("a_id"),
        greatest(col("x.id"), col("y.id")).as("b_id"))
      .distinct()
    val vecs = IncrementalStore.consistentScan(spark, s"${table}_vecs")
      .select(col("id"), col("e"), col("n"))
    candidates
      .join(vecs.select(col("id").as("a_id"), col("e").as("ae"),
        col("n").as("an")), "a_id")
      .join(vecs.select(col("id").as("b_id"), col("e").as("be"),
        col("n").as("bn")), "b_id")
      .withColumn("cosine",
        round(Similarity.dot(col("ae"), col("be")) / (col("an") * col("bn")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Drop one ingestion date's partitions — the re-run/retry guard. */
  def dropDate(spark: SparkSession, table: String, date: String): Unit =
    IncrementalStore.dropDate(spark,
      Seq(s"${table}_bands", s"${table}_vecs"), date)

  /** DELETION PROPAGATION: physically remove the tombstoned ids' rows
    * from BOTH tables through the shared contract — a deleted vector can
    * never again surface as a candidate or a verification endpoint. */
  def deleteIds(spark: SparkSession, table: String,
      tombstones: DataFrame, gen: String, large: Boolean = false): Unit =
    IncrementalStore.propagateDeletes(spark, gen, Seq(
      IncrementalStore.keyTarget(s"${table}_bands", "id", tombstones, large),
      IncrementalStore.keyTarget(s"${table}_vecs", "id", tombstones, large)))
}

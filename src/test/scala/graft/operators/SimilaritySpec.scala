package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("knnBrute: k rows per query, self excluded, cosine in [-1,1], rank ordered") {
    val q = emb.filter(col("vec_id") < 5)
    val res = Similarity.knnBrute(q, emb, 3).cache()
    assert(res.count() == 5 * 3)
    assert(res.filter(col("qid") === col("cid")).count() == 0)
    assert(res.filter(abs(col("cosine")) > 1.000001).count() == 0)
    // rank 1 has the max cosine per query
    val r1 = res.filter(col("rank") === 1).select(col("qid"), col("cosine").as("c1"))
    val bad = res.join(r1, "qid").filter(col("cosine") > col("c1")).count()
    assert(bad == 0)
  }

  test("knnLsh results are a subset of the full scored space and never beat brute rank-1") {
    val q = emb.filter(col("vec_id") < 5)
    val brute = Similarity.knnBrute(q, emb, 3)
      .filter(col("rank") === 1).select(col("qid"), col("cosine").as("best"))
    val lsh = Similarity.knnLsh(q, emb, 3)
    val bad = lsh.join(brute, "qid").filter(col("cosine") > col("best")).count()
    assert(bad == 0, "ANN cannot return a better neighbor than exact search")
  }

  test("knnIvf: valid shape, self excluded, never beats brute rank-1") {
    val q = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.knnIvf(q, emb, 3).cache()
    assert(ivf.filter(col("qid") === col("cid")).count() == 0)
    assert(ivf.groupBy("qid").count().filter(col("count") > 3).count() == 0)
    val brute = Similarity.knnBrute(q, emb, 3)
      .filter(col("rank") === 1).select(col("qid"), col("cosine").as("best"))
    assert(ivf.join(brute, "qid").filter(col("cosine") > col("best")).count() == 0)
  }

  test("knnIvf: degenerate fit sample falls back to full-set fit (no throw)") {
    val q = emb.filter(col("vec_id") < 3)
    // fitFraction so small the hash-mod cutoff would select ~0 rows; the
    // guard must round the cutoff up and fall back when rows < nCells
    val ivf = Similarity.knnIvf(q, emb, 3, nCells = 16, fitFraction = 0.0004)
    assert(ivf.count() > 0)
    assert(ivf.filter(col("qid") === col("cid")).count() == 0)
  }

  test("recallAudit: hit counts are consistent with direct set intersections") {
    val audit = Similarity.recallAudit(emb, col("vec_id") < 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(audit.keySet == Set("adc", "ivf", "lsh"))
    val truth = Similarity.knnBrute(emb.filter(col("vec_id") < 10), emb, 3)
      .select(col("qid"), col("cid"))
    def hits(m: org.apache.spark.sql.DataFrame): Long =
      m.select(col("qid"), col("cid")).join(truth, Seq("qid", "cid"), "left_semi").count()
    // exact methods carry their true hit counts in the gated output
    val lshHits = hits(Similarity.knnLsh(emb.filter(col("vec_id") < 10), emb, 3))
    assert(audit("lsh").getLong(3) == lshHits)
    assert(math.abs(audit("lsh").getDouble(4) - lshHits / 30.0) < 1e-5)
    // the IVF row is UNMASKED since round 9: its quantizer is the repo's
    // deterministic k-means, so n_hits/recall carry the true numbers and
    // recall_ok still carries the deployment floor
    val ivfHits = hits(Similarity.knnIvfDeterministic(
      emb.filter(col("vec_id") < 10), emb, 3, nProbe = 6))
    assert(audit("ivf").getLong(3) == ivfHits)
    assert(math.abs(audit("ivf").getDouble(4) - ivfHits / 30.0) < 1e-5)
    assert(audit("ivf").getBoolean(5) == (ivfHits / 30.0 >= 0.4))
    // on this corpus the floor actually holds, so the audit must say so
    assert(audit("ivf").getBoolean(5), "IVF recall fell below the 0.4 floor")
  }

  test("knnIvfDeterministic fails fast when the fit sample is smaller than nCells") {
    import spark.implicits._
    // 40 vectors → the 10% FNV sample cannot reach 16 rows; the engine
    // must refuse (the oracle always fits on the sample — a silent
    // fit-on-everything fallback would diverge from it undetectably)
    val tiny = (0 until 40).map(i => (i.toLong, Array.fill(8)(i.toFloat + 1)))
      .toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.knnIvfDeterministic(tiny.filter(col("vec_id") < 3), tiny)
    }
    assert(err.getMessage.contains("fitPercent"))
    // raising fitPercent to 100 makes the same table work
    val ok = Similarity.knnIvfDeterministic(
      tiny.filter(col("vec_id") < 3), tiny, fitPercent = 100)
    assert(ok.count() > 0)
  }

  test("cosineNearDupBlocked output equals the all-pairs baseline (every block count)") {
    val brute = Similarity.cosineNearDup(emb, 0.4).collect().toSet
    for (nBlocks <- Seq(1, 3, 8)) {
      val blocked = Similarity.cosineNearDupBlocked(emb, 0.4, nBlocks).collect().toSet
      assert(blocked == brute, s"nBlocks=$nBlocks")
    }
  }

  test("cosineNearDupBlocked plans an equi-join, not a nested-loop cartesian") {
    val plan = Similarity.cosineNearDupBlocked(emb, 0.4, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("cosineNearDupBanded: recall 1.0 at a realistic threshold on clustered vectors") {
    import spark.implicits._
    // 40 base directions, 5 noisy copies each: true near-dups are the
    // intra-cluster pairs (cosine > 0.99); cross-cluster pairs are far.
    def vec(base: Int, copy: Int): Array[Float] = {
      val r = new scala.util.Random(base)
      val b = Array.fill(64)(r.nextGaussian())
      val rn = new scala.util.Random(base * 1000 + copy + 1)
      b.map(x => (x + 0.02 * rn.nextGaussian()).toFloat)
    }
    val rows = for (b <- 0 until 40; c <- 0 until 5)
      yield (b * 5L + c, vec(b, c))
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDup(df, 0.95).collect().toSet
    assert(exact.size >= 40 * 10, s"expected >=400 intra-cluster pairs, got ${exact.size}")
    val banded = Similarity.cosineNearDupBanded(df, 0.95).collect().toSet
    assert(banded == exact, s"banded missed ${(exact -- banded).size} of ${exact.size} pairs")
  }

  test("banded LSH derives bits-per-band by the log2 N law at three corpus sizes") {
    // fixture scale (sf0.01 augmented ≈ 1.2k): 11 bits
    assert(Similarity.derivedRowsPerBand(1210L, 128) == 11)
    // sf0.1 augmented ≈ 12k: 14 bits — the regime where the old fixed
    // 8-bit default started to go pigeonhole-quadratic
    assert(Similarity.derivedRowsPerBand(12100L, 128) == 14)
    // 50x composite ≈ 600k: clamped at 16 bits (beyond it the per-band
    // match probability for true near-dups decays past the miss budget)
    assert(Similarity.derivedRowsPerBand(600000L, 128) == 16)
    // floor clamp: tiny corpora never band below 4 bits
    assert(Similarity.derivedRowsPerBand(10L, 128) == 4)
    // exact powers of two: ceil(log2 n), not floor
    assert(Similarity.derivedRowsPerBand(256L, 128) == 8)
    assert(Similarity.derivedRowsPerBand(257L, 128) == 9)
  }

  test("the 16-bit clamp holds at every corpus size past 2^16 (the documented quadratic re-entry)") {
    // past the ceiling the law FREEZES at r=16 and the candidate mass
    // re-enters a quadratic regime with coefficient b/2^17 (scaladoc'd
    // cost bound on derivedRowsPerBand) — pin that no N ever derives a
    // wider band (recall decay) or narrower one (mass explosion)
    for (n <- Seq(1L << 16, 200000L, 1L << 20, 1L << 24, 1L << 30,
        Long.MaxValue))
      assert(Similarity.derivedRowsPerBand(n, 128) == 16,
        s"r must clamp at 16 for n=$n")
    // the nPlanes/2 cap binds before the log law when planes are scarce:
    // at least 2 bands must exist for the miss bound to mean anything
    assert(Similarity.derivedRowsPerBand(1L << 20, 16) == 8)
    assert(Similarity.derivedRowsPerBand(1L << 20, 8) == 4)
  }

  test("two-level banding (forced): recall 1.0 on clustered vectors, candidates a subset of single-level's") {
    import spark.implicits._
    def vec(base: Int, copy: Int): Array[Float] = {
      val r = new scala.util.Random(base)
      val b = Array.fill(64)(r.nextGaussian())
      val rn = new scala.util.Random(base * 1000 + copy + 1)
      b.map(x => (x + 0.02 * rn.nextGaussian()).toFloat)
    }
    val rows = for (b <- 0 until 40; c <- 0 until 5)
      yield (b * 5L + c, vec(b, c))
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDup(df, 0.95).collect().toSet
    val two = Similarity.cosineNearDupBanded(df, 0.95, twoLevel = Some(true))
      .collect().toSet
    // the ∃-band₁ ∧ ∃-band₂ scheme still catches every true near-dup here
    assert(two == exact,
      s"two-level missed ${(exact -- two).size} of ${exact.size} pairs")
    // candidate MASS: requiring a second independent collision can only
    // shrink the candidate set (the 2^r/b mass cut the level exists for)
    val r = Similarity.derivedRowsPerBand(df.count(), 128)
    val c1 = Similarity.bandedCandidatePairs(df, 128, r, engaged = false)
      .collect().toSet
    val c2 = Similarity.bandedCandidatePairs(df, 128, r, engaged = true)
      .collect().toSet
    assert(c2.subsetOf(c1), "two-level candidates must be ⊆ single-level's")
  }

  test("two-level engagement law: override honored, explicit width opts out, auto fires only at N >= 2^21") {
    // caller override always wins
    assert(Similarity.twoLevelEngaged(10L, None, Some(true)))
    assert(!Similarity.twoLevelEngaged(Long.MaxValue, None, Some(false)))
    // an explicit band-width override opts out of auto-engagement (it
    // opted out of the self-sizing law entirely)
    assert(!Similarity.twoLevelEngaged(Long.MaxValue, Some(16), None))
    // auto: every local probe scale serves single-level...
    for (n <- Seq(1210L, 12100L, 200000L, 500000L, (1L << 21) - 1))
      assert(!Similarity.twoLevelEngaged(n, None, None), s"n=$n")
    // ...and corpus scale past 2^21 engages the hierarchy
    for (n <- Seq(1L << 21, 5000000L, 1L << 30))
      assert(Similarity.twoLevelEngaged(n, None, None), s"n=$n")
  }

  test("cosineNearDupBanded plans equi-joins only (no nested-loop, no cartesian)") {
    val plan = Similarity.cosineNearDupBanded(emb, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the two-level composite-key join keeps the same property — the
    // ∃∧∃ product space is ONE equi-join on four key columns, never a
    // post-filter over the level-1 candidate stream
    val plan2 = Similarity.cosineNearDupBanded(emb, 0.9,
        twoLevel = Some(true))
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("BroadcastNestedLoopJoin"), plan2.take(2000))
    assert(!plan2.contains("CartesianProduct"), plan2.take(2000))
  }

  test("cosineNearDup is symmetric-free (a<b) and matches dot/norm math on a known pair") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val res = Similarity.cosineNearDup(d, 0.9).collect()
    assert(res.length == 1)
    assert(res.head.getLong(0) == 1L && res.head.getLong(1) == 2L)
    assert(math.abs(res.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("standardizeAudit: z-scoring equalizes per-dim scale, hand-checked") {
    import spark.implicits._
    // dim 0 sd=1, dim 1 sd=10 (population): both vectors standardize to
    // z = (±1, ±1) so norm_std = sqrt(2) regardless of the raw scale;
    // a third zero-variance dim contributes z = 0, not NaN
    val d = Seq(
      (1L, Array(1.0f, 10.0f, 5.0f)),
      (2L, Array(3.0f, 30.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.standardizeAudit(d).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((11.224972, 1.414214)))  // sqrt(1+100+25), sqrt(2)
    assert(got(2L) == ((30.561414, 1.414214)))  // sqrt(9+900+25), sqrt(2)
  }
}

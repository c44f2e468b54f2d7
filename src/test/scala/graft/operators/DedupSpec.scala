package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("exact dedup: one row per distinct text, multiplicities sum to row count") {
    val d = Dedup.exact(docs)
    val total = d.agg(sum("n_copies")).head.getLong(0)
    assert(total == docs.count())
    assert(d.count() == docs.select("text").distinct().count())
  }

  test("minhash LSH finds every exact-Jaccard pair at j >= 0.6 (high-recall zone)") {
    val exact = Dedup.ngramJaccard(docs, 0.6).select("a_id", "b_id")
    val lsh = Dedup.minhashLsh(docs, 0.5).select("a_id", "b_id")
    val missed = exact.exceptAll(exact.intersect(lsh)).count()
    assert(exact.count() > 0, "test needs some high-jaccard pairs in the corpus")
    assert(missed == 0, s"LSH missed $missed pairs with jaccard >= 0.6")
  }

  test("df-capped Jaccard plans a broadcast anti-join, not a df window pass") {
    // static (pre-execution) adaptive plan: the only form that prints the
    // full operator tree (a finalized AQE plan collapses completed stages
    // into opaque QueryStage references)
    val plan = Dedup.ngramJaccard(docs, 0.5, maxDocFreq = Some(50))
      .queryExecution.executedPlan.toString
    // heavy hitters arrive via a LEFT ANTI join against the aggregated
    // drop-set (AQE picks broadcast when it is small) — the wide
    // exploded-row stream is never window-exchanged to learn df
    assert("Join .*LeftAnti".r.findFirstIn(plan).isDefined, plan.take(1500))
    // only the per-doc count window remains (one per self-join side); the
    // old formulation carried an extra Window.partitionBy(sh) pass per side
    val nWindows = "Window \\[".r.findAllIn(plan).size
    assert(nWindows <= 2, s"expected <=2 Window ops, got $nWindows")
  }

  test("minhash LSH reports no false positives below threshold (verified pairs only)") {
    val lsh = Dedup.minhashLsh(docs, 0.5)
    assert(lsh.filter(col("jaccard") < 0.5).count() == 0)
    // verification step means every reported jaccard equals the exact one
    val exact = Dedup.ngramJaccard(docs, 0.5)
    val joined = lsh.as("l").join(exact.as("e"),
      Seq("a_id", "b_id")).filter(col("l.jaccard") =!= col("e.jaccard"))
    assert(joined.count() == 0)
  }

  test("simhash: near-identical docs collide, signature is order-insensitive") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "theta eta zeta epsilon delta gamma beta alpha"), // same bag of words
      (3L, "totally different content about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val sig = SimHash.signatures(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L), "same token set must give identical simhash")
    assert(sig(1L) != sig(3L))
    val pairs = Dedup.simhashPairs(d, 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("shingles guard: docs shorter than n tokens produce no shingles, no crash") {
    import spark.implicits._
    val d = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccard(d, 0.1)
    assert(out.count() == 0)
  }

  test("winnowed-candidate pairing equals exact all-pairs Jaccard on the corpus") {
    val exact = Dedup.ngramJaccard(docs, 0.5)
    val winnowed = Dedup.winnowedJaccard(docs, 0.5)
    assert(exact.count() > 0)
    assert(winnowed.exceptAll(exact).isEmpty && exact.exceptAll(winnowed).isEmpty,
      "winnowed candidates must reach recall 1.0 on this corpus (verified pairs equal)")
  }

  test("winnowing coverage: docs sharing a >= w+2 word substring share a fingerprint") {
    import spark.implicits._
    // distinct prefixes/suffixes, one 8-word shared run (w=4 needs >= 6)
    val shared = "the quick brown fox jumps over lazy dogs"
    val d = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"uno dos tres cuatro $shared cinco"),
      (3L, "completely unrelated words in this other document here")).toDF("doc_id", "text")
    val fps = Dedup.winnowedHashes(d, 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "winnowing must select a shared fingerprint inside the shared run")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "no token overlap should mean no shared fingerprints")
  }

  test("over-cap duplicate clusters emit the COMPLETE all-pairs set (star + expansion)") {
    import spark.implicits._
    // one text duplicated across 12 docs with a cap of 5: every fingerprint
    // of the cluster has df=12 > 5, so the capped candidate path alone sees
    // NOTHING — the star path pairs each member with the cluster min, and
    // the post-verification expansion recovers every member-member pair,
    // matching the exact all-pairs oracle contract
    val dup = "the exact same long document text repeated verbatim across " +
      "many different ingestion dates with identical token content"
    val d = ((1L to 12L).map(i => (i, dup)) ++
      Seq((100L, "an unrelated singleton document with its own words here")))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowedJaccard(d, 0.5, maxDocFreq = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val want = (for (a <- 1L to 12L; b <- (a + 1) to 12L) yield (a, b)).toSet
    assert(pairs == want,
      s"expected all C(12,2)=${want.size} pairs, got ${pairs.size}: " +
        s"missing=${(want -- pairs).take(5)} extra=${(pairs -- want).take(5)}")
  }

  test("cluster larger than the DEFAULT cap: all pairs out, components recover the cluster") {
    import spark.implicits._
    // 60 identical docs > maxDocFreq=50 (the default the oracle queries
    // run with): the regime the gate SFs never reach, pinned here — the
    // star+expansion output is the full C(60,2) pair list, and q62's
    // label propagation recovers the single 60-member component from it
    val dup = "sixty copies of one long identical training document shared " +
      "verbatim across every ingestion batch in the synthetic corpus"
    val d = ((1L to 60L).map(i => (i, dup)) ++ Seq(
      (200L, "an unrelated document with entirely distinct vocabulary one"),
      (201L, "another unrelated text carrying its own words and nothing shared")))
      .toDF("doc_id", "text")
    val out = Dedup.winnowedJaccard(d, 0.5).cache()
    assert(out.count() == 60L * 59 / 2, "full all-pairs output above the default cap")
    assert(out.filter(col("jaccard") =!= 1.0).count() == 0)
    val comp = Components.dedupClusters(out.select("a_id", "b_id"))
    val c = comp.filter(col("component") === 1L)
    assert(c.count() == 60, "one transitive component containing every member")
  }

  test("winnowing density: fingerprints are a ~1/w subset of the doc's shingle hashes") {
    val fp = Dedup.winnowedHashes(docs, 4)
    val perDoc = fp.groupBy("id").agg(count(lit(1)).as("n_fp"))
    val shingles = docs.select(col("doc_id").as("id"),
      size(graft.functions.ShingleHashes.shingleHashes(col("text"), 3))
        .cast("bigint").as("n_sh"))
    val joined = perDoc.join(shingles, "id")
      .agg(sum("n_fp").cast("double") / sum("n_sh")).head.getDouble(0)
    // expected selection density for window w is ~2/(w+1) = 0.4 on random
    // hashes; allow a wide band (repeated shingles shrink the distinct set)
    assert(joined > 0.15 && joined < 0.75, s"selection density $joined")
  }
}

package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines, all pure DataFrame plans.
  *
  * Scale design (the point of each variant):
  *  - exact: one hash-aggregate shuffle on the content key — optimal already;
  *  - ngramJaccard: exact all-pairs via a shingle inverted index; the
  *    self-join fans out per shared shingle, so it is quadratic in the worst
  *    case — correct baseline, use at audit scale;
  *  - minhashLsh: the 100 TB path — k permutation-min signatures per doc
  *    (one aggregate), banded so only docs sharing a band hash ever meet in
  *    the candidate join; candidates are then verified with exact Jaccard.
  *    Cost is ~linear in corpus size for bounded near-dup density;
  *  - simhash: one 64-bit signature per doc (typed Aggregator), banded
  *    16-bit sub-keys for candidate generation, Hamming-verified.
  */
object Dedup {

  /** Exact dedup on a content column: canonical (min) id + multiplicity. */
  def exact(docs: DataFrame, keyCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop(keyCol)

  /** Per-doc distinct shingle sets as (id, n, shingleHash) exploded rows —
    * `n` (the doc's distinct-shingle count) rides along with every row, so
    * Jaccard needs no separate per-doc count subtree (that would re-scan and
    * re-shingle the corpus) and the self-join's two identical sides collapse
    * into one physical exchange via ReuseExchange.
    *
    * Hashed (8-byte) join keys instead of n-gram strings: Jaccard over the
    * distinct-hash sets equals Jaccard over the string shingle sets modulo
    * 64-bit collisions (see [[graft.functions.ShingleHashes]]). */
  private def shingleIndex(docs: DataFrame, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        graft.functions.ShingleHashes.shingleHashes(col("text"), 3).as("arr"))
      .select(col("id"), size(col("arr")).cast("bigint").as("n"),
        explode(col("arr")).as("sh"))

  /** Exact all-pairs n-gram Jaccard ≥ threshold via inverted-index self-join.
    * One shuffle (by shingle hash, reused for both sides) + one pair
    * aggregation; counts are carried, not recomputed.
    *
    * `maxDocFreq`: optionally drop shingles occurring in more than that many
    * docs before pairing. The join cost is Σ df² over shingles, so a handful
    * of corpus-wide shingles dominate it at scale (measured: uncapped growth
    * is ~19.5× at 10× docs); capping bounds the fan-out per shingle while
    * barely moving Jaccard for near-dup pairs (ubiquitous shingles carry no
    * discrimination). The semantics become "Jaccard over shingles with
    * df ≤ cap" — still exact and oracle-replayable. */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.5,
      idCol: String = "doc_id", maxDocFreq: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = shingleIndex(docs, idCol)
    val sh = maxDocFreq match {
      case None => base
      case Some(cap) =>
        // The drop-set (shingles with df > cap) is computed with a
        // partial-aggregated narrow shuffle and anti-joined — the wide
        // exploded-row stream is never exchanged just to learn df (a
        // Window.partitionBy(sh) pass would shuffle every row). No forced
        // broadcast: at small scale AQE converts the anti-join to a
        // broadcast join at runtime; at corpus scale the drop-set is
        // ~rows/cap keys (LINEAR in corpus size, not "few") and must be
        // allowed to stay a shuffled join rather than blow the broadcast
        // limit. Post-cap per-doc counts then ride along via one window.
        val dropSet = base.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("sh"))
        base.join(dropSet, Seq("sh"), "left_anti")
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
    }
    // shuffle_hash: (a) AQE would otherwise broadcast one side at small
    // scale, which breaks ReuseExchange and recomputes the whole shingle
    // subtree per side (measured 2x slower at sf0.1); (b) at corpus scale a
    // broadcast side is impossible and SMJ adds a pointless sort — the
    // hash join partitioned by sh is the right plan at every size.
    val shJ = sh.hint("shuffle_hash")
    val pairs = shJ.as("a").join(shJ.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("inter"), min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
    jaccardFilter(pairs, threshold)
  }

  /** jaccard = inter / (na + nb - inter); emit pairs ≥ threshold.
    * Expects inter/na/nb columns on the pair rows. */
  private def jaccardFilter(pairs: DataFrame, threshold: Double): DataFrame = {
    val j = col("inter").cast("double") /
      (col("na") + col("nb") - col("inter")).cast("double")
    pairs.filter(j >= threshold)
      .select(col("a_id"), col("b_id"), round(j, 6).as("jaccard"))
  }

  /** MinHash signatures: one aggregate pass over the shingle index; k mins
    * per doc, each "permutation" a seeded re-hash of the base shingle hash
    * (xxhash64 of (seed, h) — wrap-free under ANSI mode, unlike the classic
    * affine a·h+b construction, which overflows Long). */
  def minhashSignatures(docs: DataFrame, k: Int = 32,
      idCol: String = "doc_id"): DataFrame =
    signaturesFromHashes(
      shingleIndex(docs, idCol).select(col("id"), col("sh").as("h")), k)

  /** THE signature aggregate — k component-wise minima over (id, h) hash
    * rows, packed as `sig`. Shared by the doc-level path above and every
    * other grouping granularity ([[Corpus.sourceOverlapMinhash]] groups by
    * SOURCE), so the permutation scheme can never diverge between them.
    * Min over a multiset equals min over its set: callers need not
    * distinct their hash stream first. */
  private[operators] def signaturesFromHashes(hashes: DataFrame,
      k: Int): DataFrame = {
    val mins: Seq[Column] = (0 until k).map { i =>
      min(xxhash64(lit(i), col("h"))).as(s"m$i")
    }
    hashes.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Distinct unordered candidate id pairs from (id, band, bh) rows:
    * same-band same-hash different-id, a < b. One hinted exchange feeds
    * both join sides (the reuse rationale documented at [[minhashLsh]]).
    * Shared by the doc-level LSH path and the source-granularity path so
    * candidate generation can never diverge between them. */
  private[operators] def bandCandidatePairs(bands: DataFrame): DataFrame = {
    val bandsJ = bands.hint("shuffle_hash")
    bandsJ.as("x").join(bandsJ.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id")).distinct()
  }

  /** (id, band, bh) rows for LSH banding: one xxhash64 per `rowsPerBand`
    * signature components. THE band scheme — shared by the in-memory LSH
    * path and the incremental signature store so their candidate recall
    * can never diverge. */
  def bandRows(sigs: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val nBands = k / rowsPerBand
    sigs.select(col("id"), col("sig"), posexplode(
      array((0 until nBands).map { b =>
        xxhash64((0 until rowsPerBand).map(r => col("sig")(b * rowsPerBand + r)): _*)
      }: _*)).as(Seq("band", "bh")))
  }

  /** MinHash + LSH near-dup pairs: band the signature (rows-per-band=2 →
    * catch probability 1-(1-j²)^(k/2), ≈0.99 at j=0.5 with k=32), join on
    * (band index, band hash), then verify candidates with exact Jaccard. */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.5, k: Int = 32,
      rowsPerBand: Int = 2, idCol: String = "doc_id"): DataFrame = {
    val sig = minhashSignatures(docs, k, idCol)
    // shuffle_hash (inside bandCandidatePairs): keeps the two identical
    // band subtrees reusable as one exchange (AQE's broadcast choice would
    // recompute signatures per side)
    val candidates = bandCandidatePairs(bandRows(sig, k, rowsPerBand).drop("sig"))
    verifyCandidates(docs, candidates, threshold, idCol)
  }

  /** Exact-Jaccard verification of (a_id, b_id) candidate pairs: join both
    * sides back to the shingle index, count intersections, filter. Shared
    * by every candidate-generation scheme (MinHash bands, winnowed
    * fingerprints) so verified semantics can never diverge between them. */
  private def verifyCandidates(docs: DataFrame, candidates: DataFrame,
      threshold: Double, idCol: String): DataFrame = {
    val sh = shingleIndex(docs, idCol)
    val pairs = candidates
      .join(sh.as("a"), col("a_id") === col("a.id"))
      .join(sh.as("b"), col("b_id") === col("b.id") && col("a.sh") === col("b.sh"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"), min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
    jaccardFilter(pairs, threshold)
  }

  /** Public surface of the shared exact-Jaccard verifier: turn ANY
    * (a_id, b_id) candidate list — banded LSH, winnowed fingerprints, an
    * incremental signature store — into the verified pair list with true
    * Jaccard ≥ threshold. Exactly the verifier the internal paths use, so
    * verified semantics can never diverge between candidate schemes. */
  def verifyPairs(docs: DataFrame, candidates: DataFrame,
      threshold: Double = 0.5, idCol: String = "doc_id"): DataFrame =
    verifyCandidates(docs, candidates, threshold, idCol)

  /** Near-dup pairs with WINNOWED-fingerprint candidate generation: docs
    * sharing any winnowed fingerprint (see [[winnowedHashes]]) become
    * candidates, then exact Jaccard verifies — same output contract as
    * [[minhashLsh]], different candidate economics: the fingerprint index
    * is ~1/w the shingle inverted index (no signature computation at all),
    * and winnowing's coverage property makes candidate recall structural —
    * any pair sharing one ≥ w+2 word run collides, which high-Jaccard
    * near-dups of real corpora always do. The MinHash path bounds recall
    * probabilistically instead and stays the default for paraphrase-style
    * similarity without long shared runs.
    *
    * Over-cap regime (a fingerprint shared by more than `maxDocFreq`
    * docs): candidates first take a linear STAR shape — each member
    * paired with the group's min id — and after verification each
    * surviving star group is EXPANDED to its full member-member pair set
    * and verified again, so the output is the complete all-pairs list in
    * every regime (matching the exact q21 oracle, no star-subset caveat).
    * The expansion is quadratic only in the size of TRUE duplicate
    * clusters — where the required output is itself quadratic, so the
    * cost is output-bounded — while popular-but-unrelated fingerprints
    * (a common phrase across millions of docs) still cost one linear
    * verification per member and die before any expansion. */
  def winnowedJaccard(docs: DataFrame, threshold: Double = 0.5, w: Int = 4,
      idCol: String = "doc_id", maxDocFreq: Int = 50,
      minShared: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Candidate selectivity — the lesson MinHash bands teach: ONE shared
    // fingerprint is a single shared 3-gram, far too weak a signal at
    // jaccard-0.5, and window-min selection is additionally BIASED toward
    // globally small hash values, so popular fingerprints recur across the
    // corpus. Two measures, both required (measured at sf0.1, 5k docs):
    //  - a mild df cap kills the skew tail (join cost is Σdf²: a handful
    //    of ubiquitous fingerprints would dominate it);
    //  - candidates must share ≥ `minShared` DISTINCT fingerprints — the
    //    pair count aggregates map-side, so only surviving pairs cross
    //    the wire, and exact verification then runs on a small set
    //    (uncapped single-fp candidates: ~9.5 s; this plan: ~2 s).
    // True near-dups share many rare runs, so recall survives both: the
    // oracle gate stays hash-exact (recall 1.0) at sf0.001/0.01/0.1.
    //
    // Over-cap fingerprints are NOT discarded: a df cap alone blinds the
    // operator to exactly the content dedup exists to catch — the same
    // text duplicated across MORE than maxDocFreq docs puts every one of
    // its fingerprints over the cap, zeroing its candidates. Those groups
    // instead take a linear STAR path: each member is paired with the
    // group's minimum id (df−1 pairs per group, never df²), and exact
    // verification keeps the true dups. Popular-but-unrelated
    // fingerprints (a common phrase) cost one cheap verification per
    // member and verify away.
    val allFp = winnowedHashes(docs, w, idCol)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("fp"))))
    val fp = allFp.filter(col("df") <= maxDocFreq).drop("df")
    val starPairs = allFp.filter(col("df") > maxDocFreq)
      .withColumn("m", min(col("id")).over(Window.partitionBy(col("fp"))))
      .filter(col("id") =!= col("m"))
      .select(col("m").as("a_id"), col("id").as("b_id"))
      .distinct()
    // shuffle_hash: same exchange-reuse rationale as minhashLsh
    val fpJ = fp.hint("shuffle_hash")
    val candidates = fpJ.as("x").join(fpJ.as("y"),
        col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .agg(count(lit(1)).as("nshared"))
      .filter(col("nshared") >= minShared)
      .select(col("a_id"), col("b_id"))
    val firstPass =
      verifyCandidates(docs, candidates.union(starPairs).distinct(), threshold, idCol)
    // Verified star groups expand to their full member-member pair sets
    // (plus the center edges already verified), then a second exact pass
    // verifies the expansion — Jaccard is not transitive, so member pairs
    // of a NEAR-dup star are not automatically ≥ threshold. When no
    // fingerprint is over the cap (the common regime) every frame below
    // is empty and AQE collapses the extra joins to nothing; the shingle
    // index subtree is shared with firstPass via ReuseExchange.
    val starVerified = firstPass.join(starPairs, Seq("a_id", "b_id"), "left_semi")
    val expansion = starVerified.as("x").join(starVerified.as("y"),
        col("x.a_id") === col("y.a_id") && col("x.b_id") < col("y.b_id"))
      .select(col("x.b_id").as("a_id"), col("y.b_id").as("b_id"))
    val secondPass = verifyCandidates(docs, expansion, threshold, idCol)
    firstPass.unionAll(secondPass).distinct()
  }

  /** SimHash near-dup pairs: 64-bit signature per doc via the typed
    * [[SimHash]] aggregator, 16-bit banded candidate join, Hamming-verified
    * (maxHamming ≤ 3 guarantees at least one of the 4 bands matches). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    val sig = SimHash.signatures(docs, idCol)
    val bands = sig.select(col("id"), col("sig"), posexplode(
        array((0 until 4).map(b =>
          shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL))): _*))
      .as(Seq("band", "bh")))
    // shuffle_hash: same reuse rationale as minhashLsh — one signature
    // computation feeding both join sides
    val bandsJ = bands.hint("shuffle_hash")
    bandsJ.as("x").join(bandsJ.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowed rolling-hash fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
    * the MOSS scheme): hash every POSITIONED word 3-gram (FNV-1a, so the
    * oracle can replay it), slide a window of `w` consecutive shingle
    * positions over the document, and keep the minimum hash of each full
    * window. The distinct kept hashes are the document's fingerprint set —
    * any shared substring of ≥ w+2 words between two documents GUARANTEES a
    * shared fingerprint (winnowing's coverage property), which is what makes
    * the selected ~1/w fraction of shingles a sound overlap sketch, unlike
    * naive every-wth sampling.
    *
    * Pure window-function plan: one shuffle on doc id (the per-doc window
    * sort), no self-join — scan-shaped at 100 TB. Emits (id, fp) distinct
    * rows; overlap detection joins fingerprints exactly like the shingle
    * inverted index, at 1/w the index size. */
  def winnowedHashes(docs: DataFrame, w: Int = 4,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2, "winnowing needs a window of at least 2 shingle positions")
    // one GenerateExec row per positioned 3-gram (native UDTF) — no
    // intermediate token-array column, short docs emit nothing
    val toks = docs
      .select(col(idCol).as("id"),
        graft.functions.ShingleRows.shingleRows(col("text"), 3)
          .as(Seq("pos", "s3")))
      .select(col("id"), col("pos"),
        graft.functions.Fnv64.fnv64(col("s3")).as("h"))
    val frame = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    toks
      .withColumn("fp", min(col("h")).over(frame))
      .filter(col("pos") >= w - 1) // full windows only
      .select(col("id"), col("fp"))
      .distinct()
  }
}

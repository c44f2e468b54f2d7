package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation operators — the composed pipeline steps an
  * LLM training-data system runs over raw documents. Every step is a pure
  * column/window transform (no UDFs, no driver-side loops), so the pipeline
  * is one declarative plan that Catalyst fuses; at 100 TB each step is a
  * scan-local transform except the dedup window (one shuffle on the dedup
  * key) and the pack window (one shuffle on the group key).
  */
object Corpus {

  /** Language + quality gate, then exact-dedup keeping the lowest id per
    * text. Returns surviving docs with their scores attached. */
  def cleanFilter(docs: DataFrame, minQuality: Double, keepLangs: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val perText = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    docs
      .withColumn("pred_lang", TextFunctions.langId(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .filter(col("pred_lang").isin(keepLangs: _*) && col("quality") >= minQuality)
      .withColumn("__rn", row_number().over(perText))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Deterministic train/val/test assignment (id-hash modulo, no RNG state —
    * reproducible across runs and engines). 8/1/1 by default. */
  def datasetSplit(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("split",
      when(pmod(col(idCol), lit(10)) < 8, "train")
        .when(pmod(col(idCol), lit(10)) === 8, "val")
        .otherwise("test"))

  /** Cluster-atomic train/val/test assignment — the ACT to the split-leakage
    * audit's DETECT (q140): near-dup components (from the given pair set)
    * are assigned as a UNIT, keyed on the component representative (the min
    * reachable doc id that [[Components.connected]] emits), so no val/test
    * document can ever share a near-dup cluster with a train document. Docs
    * outside every pair keep their own id as representative, which makes the
    * rule a strict generalization of [[datasetSplit]]: singleton clusters get
    * the identical 8/1/1 id-hash assignment, and only genuinely-clustered
    * docs can move.
    *
    * Returns one row per doc: (idCol, rep, split). Scale shape: the labeling
    * is the distributed per-edge label propagation; the assignment adds ONE
    * left join of corpus against labels (both id-keyed, same partitioning)
    * plus integer arithmetic — no new data-sized shuffle beyond the labeling
    * itself, and the labels side is |clustered docs| ≪ |corpus|. */
  def clusterAtomicSplit(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val lab = Components.connected(pairs).withColumnRenamed("id", idCol)
    docs.select(col(idCol))
      .join(lab, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("component"), col(idCol)))
      .withColumn("split",
        when(pmod(col("rep"), lit(10)) < 8, "train")
          .when(pmod(col("rep"), lit(10)) === 8, "val")
          .otherwise("test"))
      .select(col(idCol), col("rep"), col("split"))
  }

  /** Sequence packing: fill fixed token-budget packs in id order within each
    * group (greedy sequential fill; pack boundary = running token total
    * before this doc, integer-divided by the budget). One window per group —
    * deterministic, engine-independent integer arithmetic. */
  def sequencePack(docs: DataFrame, tokenBudget: Int, groupCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("est_tokens",
        ceil(length(col(textCol)).cast("double") / 4.0).cast("bigint"))
      .withColumn("cum_tokens", sum(col("est_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("est_tokens")).cast("double") / tokenBudget)
          .cast("bigint"))
      .select(col(idCol), col(groupCol), col("est_tokens"), col("pack_id"))
  }

  /** Train→eval DECONTAMINATION check (the n-gram overlap audit run before
    * every evaluation: e.g. GPT-3's 13-gram and PaLM's 8-gram analyses;
    * here word 3-grams to suit the tiny fixture docs): for every val/test
    * document, the fraction of its distinct shingles that also appear
    * anywhere in the train split. A high fraction means the eval doc leaks
    * (near-)verbatim training content and must be dropped or the metric
    * discounted.
    *
    * Scale shape: one distinct-shingle index (shuffle on shingle), one
    * semi-join of eval shingles against the train set (same shingle
    * partitioning, reused), one per-doc count — never doc×doc. The train
    * side is corpus-sized, so the semi-join is shuffle-on-key, not
    * broadcast; a bloom pre-filter (see BloomJoin) drops non-matching eval
    * shingles at the scan when the overlap is sparse.
    *
    * Docs with fewer than 3 tokens have no shingles and are absent from
    * the report (nothing to measure). */
  def contamination(docs: DataFrame, threshold: Double = 0.8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = datasetSplit(docs, idCol)
      .select(col(idCol).as("id"), col("split"),
        graft.functions.ShingleRows.shingleRows(col(textCol), 3).as(Seq("pos", "s3")))
      .select(col("id"), col("split"), col("s3"))
      .distinct()
    val train = sh.filter(col("split") === "train").select(col("s3")).distinct()
    val ev = sh.filter(col("split") =!= "train")
    val hits = ev.join(train, Seq("s3"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hit"))
    val frac = coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_sh")
    ev.groupBy("id", "split").agg(count(lit(1)).as("n_sh"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("split"), col("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(frac, 6).as("contamination"),
        (frac >= threshold).as("contaminated"))
  }

  /** Overlapping token-window CHUNKING — the context-window preparation
    * step for RAG indexing and long-document pretraining: each document
    * splits into windows of `window` tokens starting every `stride`
    * tokens (overlap = window − stride), the last window keeping its
    * partial tail. One row per chunk: (doc_id, chunk_id, n_tokens,
    * chunk_fp) with chunk_fp the FNV-1a of the space-joined chunk text —
    * a deterministic handle for downstream chunk-level dedup/lookup
    * (joined back by (doc_id, chunk_id·stride) slicing when the text
    * itself is needed; emitting the handle, not the substring, keeps the
    * output a fixed-width row at 100 TB).
    *
    * Scan-local plan: tokenize → per-row sequence of chunk starts →
    * posexplode → slice + hash; no shuffle at all before the caller's
    * aggregation. Docs with zero tokens produce no chunks. */
  def chunk(docs: DataFrame, window: Int = 64, stride: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need window >= stride >= 1 (overlap = window - stride)")
    val toks = filter(split(trim(col(textCol)), graft.functions.TextFunctions.WsRun), t => length(t) > 0)
    val nChunks = floor((size(col("t")) - 1) / lit(stride)).cast("bigint") + 1
    docs.select(col(idCol), toks.as("t"))
      .filter(size(col("t")) > 0)
      .select(col(idCol), col("t"),
        posexplode(sequence(lit(0L), nChunks - 1)).as(Seq("pos", "chunk_id")))
      .select(col(idCol), col("chunk_id"),
        slice(col("t"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)).as("ct"))
      .select(col(idCol), col("chunk_id"),
        size(col("ct")).cast("bigint").as("n_tokens"),
        graft.functions.Fnv64.fnv64(array_join(col("ct"), " ")).as("chunk_fp"))
  }

  /** Repeated-span detection: per document, how many of its n-token
    * windows also occur elsewhere in the corpus (in ANY document,
    * including the same one). The windowed-hash formulation of
    * exact-substring training-data dedup (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499 —
    * their suffix-array pass finds repeated ≥50-token spans; sliding
    * n-token window hashes find exactly the same repeats at the window
    * granularity and are join/aggregate-shaped). Doc-level dedup (q20–q23)
    * cannot see these: boilerplate headers, license blocks, and templated
    * paragraphs repeat across otherwise-distinct documents and inflate
    * memorization.
    *
    * Output (doc_id, n_windows, n_dup_windows, dup_ratio), one row per
    * document, totally ordered. Scale shape: the n-gram explode is
    * scan-local (transform + posexplode over the token array — n·tokens
    * rows, linear); ONE (hash)-keyed count finds duplicated window hashes
    * (map-side partial combine); one shuffle join marks each document's
    * duplicated windows; one (doc)-keyed aggregate rolls up. Nothing is
    * quadratic, nothing collects, the dup-hash table stays distributed
    * (it can be corpus-sized — never broadcast it). Window identity is
    * the 64-bit FNV of the space-joined window (the ShingleHashes
    * collision convention, ~n²/2⁶⁵). */
  /** Shared core of the batch ([[repeatedSpans]]) and incremental
    * ([[IncrementalSpans]]) span paths: base = (id, n_windows, t),
    * grams = (id, pos, h) with h the FNV-1a of each space-joined n-token
    * window. The tokenized base feeds several subtrees, so each rescans
    * the source — MEASURED decision to leave it uncached: persisting base
    * (KMeans-dims style) improved 1× wall-clock ~25% but regressed the
    * 10× growth probe 1.6×→2.4× — materializing exploded token arrays
    * (deserialized, ~5× the compressed source) costs more than columnar
    * parquet rescans. Opposite trade to k-means, whose dims feed
    * 2·iterations subtrees, not 2. */
  private[operators] def spanGrams(docs: DataFrame, n: Int,
      idCol: String, textCol: String): (DataFrame, DataFrame) = {
    require(n >= 2, "a span needs at least 2 tokens")
    val toks = filter(split(trim(col(textCol)), graft.functions.TextFunctions.WsRun), t => length(t) > 0)
    val base = docs.select(col(idCol), toks.as("t"))
      .select(col(idCol),
        greatest(size(col("t")) - (n - 1), lit(0)).cast("bigint").as("n_windows"),
        col("t"))
    val grams = base.filter(col("n_windows") > 0)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), (col("n_windows") - 1).cast("int")),
          i => graft.functions.Fnv64.fnv64(
            array_join(slice(col("t"), i + 1, lit(n)), " "))))
          .as(Seq("pos", "h")))
    (base, grams)
  }

  /** Per-doc rollup against a given duplicated-hash set — shared by the
    * batch path (dup = this corpus's repeats) and the incremental path
    * (dup = repeats across the accumulated store). */
  private[operators] def spanReport(base: DataFrame, grams: DataFrame,
      dup: DataFrame, idCol: String): DataFrame = {
    val perDoc = grams.join(dup, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_windows"))
    base.drop("t")
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        round(coalesce(col("n_dup_windows"), lit(0L)).cast("double") /
          greatest(col("n_windows"), lit(1L)), 6).as("dup_ratio"))
      .orderBy(col(idCol))
  }

  def repeatedSpans(docs: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (base, grams) = spanGrams(docs, n, idCol, textCol)
    val dup = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("h"))
    spanReport(base, grams, dup, idCol)
  }

  /** LONGEST duplicated span per document — Lee et al.'s span-LENGTH
    * lens on the same window-hash machinery (their suffix-array pass
    * reports repeated spans of ≥50 tokens; the length distribution tells
    * boilerplate headers from wholesale page copies): a run of `r`
    * CONSECUTIVE duplicated n-token windows is one duplicated span of
    * r + n − 1 tokens, so the per-doc maximum run length converts
    * directly to the longest duplicated span.
    *
    * Runs come from the classic gaps-and-islands form: per doc, among
    * duplicated window positions, pos − row_number() is constant exactly
    * within a consecutive run. Output (doc_id, n_windows, max_dup_run,
    * longest_span_tokens), totally ordered; span length is 0 for docs
    * with no duplicated window.
    *
    * Scale shape = [[repeatedSpans]] plus one window partitioned BY
    * DOCUMENT over its duplicated positions (bounded partitions) and one
    * per-doc max — nothing quadratic, dup hashes stay distributed. */
  def longestDupSpan(docs: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val (base, grams) = spanGrams(docs, n, idCol, textCol)
    val dup = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("h"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val runs = grams.join(dup, "h")
      .select(col(idCol), col("pos"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col(idCol))
      .agg(max(col("run")).as("mr"))
    base.drop("t")
      .join(runs, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("mr"), lit(0L)).as("max_dup_run"),
        when(col("mr").isNull, lit(0L))
          .otherwise(col("mr") + lit(n - 1)).cast("bigint")
          .as("longest_span_tokens"))
      .orderBy(col(idCol))
  }

  /** Repeated-span REMOVAL — the second half of Lee et al.'s
    * exact-substring dedup (arXiv:2107.06499): where [[repeatedSpans]]
    * *measures* duplication, this *cuts it out* and re-emits cleaned
    * text, the way their pipeline rewrites the training corpus after the
    * suffix-array pass. A token is removed iff it is covered by ANY
    * duplicated n-token window (a window occurring ≥2 times anywhere in
    * the corpus, including the same document); overlapping windows merge
    * into maximal spans.
    *
    * Output, one totally-ordered row per document:
    * (doc_id, n_tokens, n_removed, n_spans, clean_text) —
    * `n_spans` = number of maximal removed spans after interval-merge,
    * `clean_text` = the surviving tokens space-joined ('' when the whole
    * document is boilerplate).
    *
    * Scale shape = [[repeatedSpans]]'s plus one interval-merge window:
    * the n-gram explode is scan-local; ONE hash-keyed count finds
    * duplicated windows; one shuffle join marks each doc's duplicated
    * window starts; covered positions come from a scan-local
    * explode+distinct (≤ n·dup_windows rows, linear); merged-span
    * arithmetic is a lag() window partitioned BY DOCUMENT (bounded
    * partitions — a doc's positions, never the corpus); the cleaned text
    * is a token-level anti-join against covered positions plus one
    * per-doc ordered rollup. Nothing quadratic, nothing collected, the
    * dup-hash table stays distributed.
    *
    * `minSpanTokens` is Lee et al.'s span-LENGTH threshold (their pass
    * removes repeated substrings of ≥ 50 tokens, not every duplicated
    * 8-gram): when > n, only MAXIMAL duplicated runs of at least that
    * many tokens are masked — a short boilerplate phrase survives, a
    * wholesale page copy is cut. Implemented with [[longestDupSpan]]'s
    * islands arithmetic: covered positions get a per-doc span id (running
    * sum of span begins), spans shorter than the threshold are dropped
    * before the removal join. The default (0) masks every duplicated
    * window — the original q102 contract, byte-identical. */
  def removeRepeatedSpans(docs: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      minSpanTokens: Int = 0): DataFrame = {
    require(n >= 2, "a span needs at least 2 tokens")
    val toks = filter(split(trim(col(textCol)), graft.functions.TextFunctions.WsRun), t => length(t) > 0)
    // uncached by MEASURED decision (see [[repeatedSpans]]): persisting
    // the token arrays turned 6 cheap columnar rescans into one big
    // deserialized materialization and regressed 10× growth 2.3×→4.3×
    val base = docs.select(col(idCol), toks.as("t"))
      .select(col(idCol), size(col("t")).cast("bigint").as("n_tokens"), col("t"))
    val grams = base.filter(col("n_tokens") >= n)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), (col("n_tokens") - n).cast("int")),
          i => graft.functions.Fnv64.fnv64(
            array_join(slice(col("t"), i + 1, lit(n)), " "))))
          .as(Seq("pos", "h")))
    val dup = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("h"))
    // 1-based token positions covered by any duplicated window; DISTINCT
    // collapses the (up to n-fold) overlap between adjacent dup windows.
    val covered = grams.join(dup, "h")
      .select(col(idCol), explode(sequence(col("pos") + 1, col("pos") + n)).as("p"))
      .distinct()
    // interval merge: a covered position starts a maximal span iff the
    // previous covered position in this doc isn't its left neighbour
    val orderW = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val prev = lag(col("p"), 1).over(orderW)
    val begun = covered.withColumn("b",
      when(prev.isNull || col("p") - prev > 1, 1L).otherwise(0L))
    // positions actually removed: all covered positions, or — above the
    // length threshold — only those in maximal runs of ≥ minSpanTokens.
    // The islands arithmetic is per-doc (span id = running sum of begins,
    // one doc-partitioned window reusing the lag's shuffle) and the length
    // filter is a doc×span aggregate + join — bounded partitions, nothing
    // corpus-wide.
    val masked =
      if (minSpanTokens <= n) begun
      else {
        val spanned = begun.withColumn("span_id", sum(col("b")).over(
          orderW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val longEnough = spanned.groupBy(col(idCol), col("span_id"))
          .agg(count(lit(1)).as("span_len"))
          .filter(col("span_len") >= minSpanTokens)
          .select(col(idCol), col("span_id"))
        spanned.join(longEnough, Seq(idCol, "span_id"))
          .select(col(idCol), col("p"), col("b"))
      }
    val removedAgg = masked
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_removed"), sum(col("b")).as("n_spans"))
    val toksE = base
      .select(col(idCol), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).as("p"), col("tok"))
    val cleanAgg = toksE.join(masked.select(col(idCol), col("p")), Seq(idCol, "p"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("p"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"))
    base.drop("t")
      .join(removedAgg, Seq(idCol), "left")
      .join(cleanAgg, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col(idCol))
  }

  /** Data-MIXTURE selection under a per-source token budget — the
    * curation step that turns "all of the crawl" into "the training mix":
    * within each source, keep documents in (quality DESC, id) order while
    * the running token total stays within `budget`. Deterministic (no
    * RNG: quality is the 6-rounded [[TextFunctions.qualityScore]], the
    * token estimate is q49's ceil(chars/4)), so an engine-independent SQL
    * replay produces the identical keep set.
    *
    * Scale shape: quality/token estimate are scan-local; ONE window per
    * source (the same per-group shuffle every quota/pack operator pays);
    * no joins, no driver state. Source-count never matters — partitions
    * are per-source and a 100 TB crawl has millions of them. */
  def tokenBudgetMix(docs: DataFrame, budget: Long = 500,
      idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col("quality").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("est_tokens",
        ceil(length(col(textCol)).cast("double") / 4.0).cast("bigint"))
      .withColumn("cum_tokens", sum(col("est_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(srcCol), col("quality"), col("est_tokens"),
        col("cum_tokens"))
      .orderBy(col(srcCol), col(idCol))
  }

  /** Cross-SOURCE overlap audit: for every pair of sources sharing at
    * least one distinct word 3-gram, the intersection size and Jaccard of
    * their shingle sets — "how much does source A republish source B",
    * the duplication matrix a crawl-curation pipeline consults before
    * setting per-source mixture weights (and the source-granularity
    * counterpart of q21's per-document matrix).
    *
    * Exact inverted-index plan: distinct (source, shingle) rows, one
    * self-join on shingle (candidate mass Σ_sh df(sh)², df bounded by the
    * number of sources sharing the shingle), one pair-keyed count. Right
    * for source counts up to ~10⁴; at millions of sources use
    * [[sourceOverlapMinhash]] (constant-size per-source signatures,
    * banded pairing — the q22 machinery grouped by source). */
  def sourceOverlap(docs: DataFrame, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val sh = docs
      .select(col(srcCol).as("src"),
        graft.functions.ShingleRows.shingleRows(col(textCol), 3).as(Seq("pos", "s3")))
      .select(col("src"), col("s3"))
      .distinct()
    val cnt = sh.groupBy(col("src")).agg(count(lit(1)).as("n"))
    // one exchange on s3 feeds both sides (the simhashPairs reuse rationale)
    val shJ = sh.hint("shuffle_hash")
    val inter = shJ.as("x").join(shJ.as("y"),
        col("x.s3") === col("y.s3") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("src_a"), col("y.src").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("src").as("src_a"), col("n").as("n_a")), "src_a")
      .join(cnt.select(col("src").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("inter"),
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")), 6).as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** [[sourceOverlap]]'s registered millions-of-sources scale path:
    * per-SOURCE MinHash signatures + banded pairing, then the exact
    * verification step restricted to candidate pairs — the q22 economics
    * at source granularity. The exact path's self-join costs Σ_sh df(sh)²
    * (df = sources sharing the shingle), fine to ~10⁴ sources; here each
    * source is first reduced to a CONSTANT-size signature (k longs — one
    * aggregate over the shingle stream; min over the multiset equals min
    * over the set, so no distinct pass), and only sources agreeing on at
    * least one signature component ever meet in the candidate join.
    *
    * Banding uses r=1 (every component is a band) because source-level
    * Jaccard is structurally LOW — sources share boilerplate, not pages;
    * the fixture's true pairs sit at j ∈ [0.013, 0.26] — and the r=1 miss
    * probability (1−j)^k is the only one that stays negligible down
    * there: at j = threshold = 0.05 and k = 256 it is ≈ 2·10⁻⁶ (r=2
    * banding would miss ~90% of j=0.06 pairs). Candidates are then
    * verified with EXACT intersection/Jaccard over the distinct shingle
    * sets — candidate generation affects recall only, never emitted
    * values — and pairs at/above `threshold` are emitted with
    * [[sourceOverlap]]'s exact columns (gated as q130 against q105's
    * oracle + the threshold filter; recall 1.0 verified at sf0.001/0.01/
    * 0.1).
    *
    * Scale shape: signature aggregate (map-side combined, k longs per
    * source), band self-join keyed on (band, component) with k rows per
    * source, exact verification keyed on candidate source ids then
    * shingle — every join key-partitioned, nothing all-pairs, nothing
    * driver-side. */
  def sourceOverlapMinhash(docs: DataFrame, threshold: Double = 0.05,
      k: Int = 256, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val shingles = docs
      .select(col(srcCol).as("src"),
        graft.functions.ShingleRows.shingleRows(col(textCol), 3).as(Seq("pos", "s3")))
      .select(col("src"), col("s3"))
    // Dedup's shared signature aggregate + band pairing, grouped by SOURCE
    // instead of document — the permutation scheme and candidate join are
    // literally the doc-level path's code, so they can never diverge
    val sigs = Dedup.signaturesFromHashes(
      shingles.select(col("src").as("id"),
        graft.functions.Fnv64.fnv64(col("s3")).as("h")), k)
    val candidates = Dedup.bandCandidatePairs(
        Dedup.bandRows(sigs, k, rowsPerBand = 1).drop("sig"))
      .select(col("a_id").as("src_a"), col("b_id").as("src_b"))
    val sh = shingles.distinct()
    val cnt = sh.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sh.as("a"), col("src_a") === col("a.src"))
      .join(sh.as("b"),
        col("src_b") === col("b.src") && col("a.s3") === col("b.s3"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.select(col("src").as("src_a"), col("n").as("n_a")), "src_a")
      .join(cnt.select(col("src").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("inter"),
        round(col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Temperature-scaled source sampling weights — the multilingual /
    * multi-source mixture law (Conneau & Lample, "Cross-lingual Language
    * Model Pretraining", NeurIPS'19 §3.1; also XLM-R, mT5): source s with
    * token share p_s is sampled with probability p_s^α / Σ_t p_t^α. α < 1
    * flattens the mixture — low-resource sources are up-sampled (boost =
    * weight/p > 1), dominant ones down-sampled — and α=1 recovers
    * proportional sampling.
    *
    * Determinism contract: p_s^α is rounded to 6 BEFORE the normalizer is
    * summed (through DECIMAL, order-independent), so both the weights and
    * the normalizer replay bit-identically in any engine (the q77/q75
    * convention applied to a power instead of a log).
    *
    * Scale shape: one hash-aggregate per source over the scan (map-side
    * combined), then all arithmetic happens on the AGGREGATE-sized
    * per-source table — two tiny aggregates + two broadcast joins of
    * 1-row frames. A crawl with millions of sources keeps the per-source
    * table distributed; nothing here ever sees a data-sized row count. */
  def temperatureMix(docs: DataFrame, alpha: Double = 0.3,
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val per = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(ceil(length(col(textCol)).cast("double") / 4.0).cast("bigint"))
          .as("est_tokens"))
    val tot = per.agg(sum(col("est_tokens")).as("total"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("p", col("est_tokens").cast("double") / col("total"))
      .withColumn("pa", round(pow(col("p"), lit(alpha)), 6))
    val z = scored.agg(
      sum(col("pa").cast("decimal(18,6)")).cast("double").as("z"))
    scored.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("est_tokens"),
        round(col("p"), 6).as("p"),
        round(col("pa") / col("z"), 6).as("weight"),
        round(col("pa") / col("z") / col("p"), 6).as("boost"))
      .orderBy(col("source"))
  }

  /** Content-defined chunking (CDC) — chunk boundaries chosen by CONTENT,
    * not position: a boundary falls after char i whenever the FNV-1a hash
    * of the `window`-char substring ending at i is ≡ 0 (mod `modulus`),
    * plus one forced boundary at the doc end. The LBFS/rsync trick
    * (Muthitacharoen et al., "A Low-bandwidth Network File System",
    * SOSP'01): because boundaries depend only on a local window, an
    * insertion shifts at most the chunks it touches — boundaries RE-SYNC
    * downstream, so shifted-but-identical content hashes to identical
    * chunks. Fixed-stride chunking ([[chunk]]) loses all alignment after
    * one inserted byte; CDC is the shift-robust dedup-storage primitive.
    * Expected chunk length ≈ `modulus` chars.
    *
    * Output: one fixed-width row per chunk (doc_id, chunk_idx, start,
    * chunk_len, is_first) where is_first marks the first corpus-wide
    * occurrence of the chunk's content in (doc_id, chunk_idx) order —
    * `sum(chunk_len) WHERE is_first` over `sum(chunk_len)` is the stored-
    * bytes ratio a dedup store would achieve. Chunk text is re-derivable
    * by (doc_id, start, chunk_len) slicing; emitting the handle keeps rows
    * fixed-width at 100 TB.
    *
    * Scale shape: boundary detection is a per-row array transform over the
    * scan (no shuffle); the only shuffle is the first-occurrence window on
    * the chunk-content hash. Engine groups FNV hashes where the oracle
    * groups chunk STRINGS (the q101 convention — collision-free parity is
    * what the gate checks). Per-position hashing costs O(window) byte ops
    * (window=8 ⇒ ~8 ops/char inside codegen); a true O(1)/char Rabin
    * rolling hash would need a native stateful Expression — the right
    * upgrade if profiles ever show this scan hot. */
  def contentDefinedChunks(docs: DataFrame, window: Int = 8,
      modulus: Int = 32, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window >= 1 && modulus >= 1, "need window >= 1 and modulus >= 1")
    val txt = col(textCol)
    val n = length(txt)
    // boundary END positions i ∈ [window, n]; sequence() is DESCENDING
    // when start > stop, so short docs short-circuit to an empty cut list
    val cuts = when(n >= window,
      filter(sequence(lit(window), n), i =>
        pmod(graft.functions.Fnv64.fnv64(
          txt.substr(i - (window - 1), lit(window))), lit(modulus)) === 0))
      .otherwise(array().cast("array<int>"))
    val ends = array_distinct(concat(cuts, array(n)))
    val starts = concat(array(lit(0)), slice(ends, lit(1), size(ends) - 1))
    val chunks = zip_with(starts, ends,
      (s, e) => struct((s + 1).as("start"), (e - s).as("chunk_len")))
    val perChunk = docs
      .filter(txt.isNotNull && n >= 1)
      .select(col(idCol).as("doc_id"), txt.as("__text"),
        posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        col("c.start").cast("bigint").as("start"),
        col("c.chunk_len").cast("bigint").as("chunk_len"),
        graft.functions.Fnv64.fnv64(
          col("__text").substr(col("c.start"), col("c.chunk_len"))).as("__h"))
    val firstW = Window.partitionBy(col("__h"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    perChunk
      .withColumn("is_first", row_number().over(firstW) === 1)
      .select(col("doc_id"), col("chunk_idx"), col("start"),
        col("chunk_len"), col("is_first"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }
}

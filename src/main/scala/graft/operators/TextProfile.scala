package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-quality profiling beyond per-row scalar features (those live in
  * functions.TextFunctions): repetition metrics, an in-corpus character
  * n-gram language model, and PII redaction — the document-level filters a
  * training-data pipeline applies between ingestion and tokenization.
  */
object TextProfile {

  /** Gopher-style repetition metrics (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446, §A1.1): the fraction of a document covered by its
    * most-frequent word and most-frequent word 2-gram. Heavily repeated
    * content (boilerplate, keyword stuffing, generation loops) shows up as
    * a high top-fraction long before exact dedup can catch it.
    *
    * Output: (doc_id, n_tokens, top_word_frac, top_bigram_frac,
    * repetitive) with fractions rounded to 6. One shuffle on doc_id (the
    * bigram window + the three per-doc aggregates all share it).
    *
    * `repetitive` flags top_bigram_frac > threshold — Gopher's published
    * cut for duplicate 2-grams is 0.20; it is a parameter here. */
  def repetitionMetrics(docs: DataFrame, threshold: Double = 0.2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), graft.functions.TextFunctions.WsRun)).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0)
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val big = toks
      .withColumn("nxt", lead(col("w"), 1).over(wOrd))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("nxt")).as("bg"))
    val n = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val topW = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("max_w"))
    val topB = big.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("max_bg"))
    n.join(topW, "doc_id").join(topB, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        round(col("max_w").cast("double") / col("n_tokens"), 6).as("top_word_frac"),
        round(col("max_bg").cast("double") / (col("n_tokens") - 1), 6).as("top_bigram_frac"))
      .withColumn("repetitive", col("top_bigram_frac") > threshold)
  }

  /** In-corpus character-trigram language-model score — the KenLM-style
    * fluency filter (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data", LREC'20) with the model
    * TRAINED ON THE CORPUS ITSELF in the same job: two aggregations build
    * the trigram model (count(tri) and its 2-char-prefix marginal), then
    * every trigram occurrence scores ln P(c₃|c₁c₂) = ln(c3/c2) and docs
    * aggregate (n_trigrams, total log-prob). Outlier documents (wrong
    * language, binary junk, unnatural character stats) sit far below the
    * corpus's per-trigram average.
    *
    * Scale shape: the trigram stream is scan-local (sequence+transform,
    * one row per char position); the model tables are bounded by
    * |charset|³ distinct trigrams — broadcast-sized for any real corpus —
    * so scoring is a broadcast join, and the only data-sized shuffles are
    * the model aggregation and the per-doc rollup.
    *
    * Determinism contract: per-occurrence ln rounded to 6, summed through
    * DECIMAL (exact, order-independent), emitted as double. */
  def trigramLmScore(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // native generator: one row per char trigram straight off the scan —
    // the transform(sequence(...)) HOF it replaces is interpreted AND
    // allocates a document-length array per row before exploding
    val tri = docs.select(col(idCol).as("doc_id"),
      graft.functions.CharNgramRows.charNgramRows(col(textCol), 3).as("tri"))
    val c3 = tri.groupBy("tri").agg(count(lit(1)).as("c3"))
    val c2 = c3.groupBy(substring(col("tri"), 1, 2).as("pre"))
      .agg(sum(col("c3")).as("c2"))
    val lnp = round(log(col("c3").cast("double") / col("c2")), 6)
    tri.join(broadcast(c3), "tri")
      .join(broadcast(c2.withColumnRenamed("pre", "p2")),
        substring(col("tri"), 1, 2) === col("p2"))
      .select(col("doc_id"), lnp.cast("decimal(18,6)").as("lnp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("lnp")).cast("double").as("sum_lnp"))
      .select(col("doc_id"), col("n_trigrams"),
        col("sum_lnp"),
        round(col("sum_lnp") / col("n_trigrams"), 6).as("avg_lnp"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
    * score every document with the corpus-trained trigram LM
    * ([[trigramLmScore]]), estimate tercile edges, and assign each
    * document to head / middle / tail — the fluency stratification CCNet
    * uses to keep the head and audit the tail of a web crawl.
    *
    * The edges come from a DETERMINISTIC hash-mod sample (q56's
    * content-addressed scheme: FNV-1a of the id string mod `sampleMod`
    * < `samplePct`), exact-ntiled in (score, id) order — the q94 recipe,
    * so the single-task sort sees only the bounded sample while the edge
    * values replay in any engine. Assignment is a broadcast of the 1-row
    * edge table against the full scored corpus; ties at an edge go to the
    * lower bucket on both sides of the oracle.
    *
    * Scale shape: LM scoring is [[trigramLmScore]]'s (scan-local trigram
    * stream, broadcast model tables); edges are one bounded-sample sort;
    * assignment is scan + broadcast — no data-sized shuffle beyond the
    * per-doc rollup already inside the LM score. */
  def perplexityBuckets(docs: DataFrame, sampleMod: Long = 100L,
      samplePct: Long = 30L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = trigramLmScore(docs, idCol, textCol)
      .select(col("doc_id"), col("avg_lnp"))
    val sample = scored.filter(
      pmod(graft.functions.Fnv64.fnv64(col("doc_id").cast("string")),
        lit(sampleMod)) < samplePct)
    val tiles = sample
      .withColumn("tile", ntile(3).over(Window.orderBy(col("avg_lnp"), col("doc_id"))))
    val edges = tiles.groupBy()
      .agg(max(when(col("tile") === 1, col("avg_lnp"))).as("e1"),
        max(when(col("tile") <= 2, col("avg_lnp"))).as("e2"))
    scored.crossJoin(broadcast(edges))
      .select(col("doc_id"), col("avg_lnp"),
        when(col("avg_lnp") <= col("e1"), "tail")
          .when(col("avg_lnp") <= col("e2"), "middle")
          .otherwise("head").as("bucket"))
      .orderBy(col("doc_id"))
  }

  // Conservative, RE2-and-Java-compatible patterns (no lookarounds, no
  // backrefs) so the exact same regex runs in Spark and in the DuckDB
  // oracle. \b is supported by both.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII scrubbing: count and redact email addresses and NNN-NNN-NNNN
    * phone numbers. Purely scan-local (regex per row, no shuffle) — the
    * shape that matters, since redaction runs over EVERY byte of a 100 TB
    * corpus and must stay inside the scan stage. */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(EmailRe)), regexp_count(text, lit(PhoneRe)))

  /** Heaps'-law vocabulary-growth audit — distinct-vocabulary size as a
    * function of corpus size (Heaps, "Information Retrieval", 1978:
    * V ≈ K·nᵝ): the corpus in id order splits into `buckets` id-RANGE
    * slices, and each reports cumulative tokens and cumulative NEW
    * vocabulary (terms whose first occurrence falls in or before the
    * slice). Flattening growth ⇒ the crawl is saturating its domain;
    * a sudden vocab spike flags an encoding break or a new language
    * entering the mix — a standard corpus-health dashboard.
    *
    * Buckets come from the ID RANGE (floor(buckets·id/(max+1))), NOT a
    * global ntile — a corpus-wide ntile is a single-task window (the q90
    * trap); the range rule is scan-local after one broadcast max. First
    * occurrences are one min-aggregate over the token stream; the
    * cumulative window runs over `buckets` rows. */
  def heapsAudit(docs: DataFrame, buckets: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(filter(graft.functions.TextFunctions.tokens(col(textCol)),
        w => length(w) > 0)).as("w"))
    val mx = docs.agg((max(col(idCol)) + 1).as("m"))
    val bucketOf = floor(lit(buckets) * col("doc_id").cast("double") / col("m"))
      .cast("bigint")
    val db = docs.select(col(idCol).as("doc_id")).crossJoin(broadcast(mx))
      .select(col("doc_id"), bucketOf.as("bucket"))
    val perDocTokens = toks.groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val bucketTokens = db.join(perDocTokens, Seq("doc_id"), "left")
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("nt"), lit(0L))).as("toks"))
    val firstDoc = toks.groupBy("w").agg(min(col("doc_id")).as("doc_id"))
    val bucketVocab = firstDoc.join(db, "doc_id")
      .groupBy("bucket").agg(count(lit(1)).as("nv"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketTokens.join(bucketVocab, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        sum(col("toks")).over(w).as("cum_tokens"),
        sum(coalesce(col("nv"), lit(0L))).over(w).as("cum_vocab"))
      .orderBy(col("bucket"))
  }

  /** Accent fold table for [[canonicalize]] — a FIXED 1:1 mapping (the
    * deterministic subset of Unicode NFKD+strip that replays identically
    * in any engine's translate(); full ICU folding is locale- and
    * version-dependent, which a cross-engine dedup key cannot afford). */
  val FoldFrom = "àáâãäåçèéêëìíîïñòóôõöùúûüÿ"
  val FoldTo = "aaaaaaceeeeiiiinooooouuuuy"

  /** Canonical normalization — the dedup KEY every exact/near-dup pass
    * actually hashes (C4, CCNet and friends normalize before comparing;
    * raw-text equality misses trivial variants): lowercase → fold
    * accents ([[FoldFrom]]) → drop every char outside [a-z0-9 ws] →
    * collapse whitespace → trim. Null folds to the empty document.
    * Pure scan-local string ops, codegen-friendly. */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        translate(lower(coalesce(text, lit(""))), FoldFrom, FoldTo),
        "[^a-z0-9 \\t\\n\\f\\r]", ""),
      "[ \\t\\n\\f\\r]+", " "))

  /** Gopher's eight stopwords (Rae et al., arXiv:2112.11446, §A1.1) — the
    * "contains at least 2 of" gate, distinct from the per-language scoring
    * lists in [[graft.functions.TextFunctions.stopwords]]. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher / MassiveText RULE-SET quality gate (Rae et al.,
    * arXiv:2112.11446, §A1.1) as per-rule booleans plus the conjunction —
    * the complement of [[graft.functions.TextFunctions.qualityScore]]'s
    * soft composite score: a curator reads WHICH rule killed a document,
    * not just that its score was low. Rules (published thresholds as
    * defaults):
    *   - word count in [minWords, maxWords] ([50, 100k])
    *   - mean word length in [3, 10] chars
    *   - symbol-to-word ratio ('#' or '...') ≤ 0.1
    *   - ≥ 80% of words contain an alphabetic character
    *   - ≥ 2 of the eight Gopher stopwords present
    *   - ≤ 90% of lines start with a bullet ('-', '*', '•')
    *   - ≤ 30% of lines end with an ellipsis ('...' or '…')
    *
    * Repetition rules (§A1.1's duplicate-n-gram fractions) live in
    * [[repetitionMetrics]] and compose by join — they need a per-doc
    * shuffle, while everything here is SCAN-LOCAL: regex/array transforms
    * per row, zero shuffles, zero joins. At 100 TB this is the filter that
    * runs over every byte, so it must (and does) stay inside one
    * whole-stage-codegen'd scan. */
  def gopherRules(docs: DataFrame, minWords: Int = 50, maxWords: Int = 100000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = graft.functions.TextFunctions.tokens(col(textCol))
    val nW = size(t).cast("bigint")
    val meanLen = length(regexp_replace(col(textCol), "[ \\t\\n\\f\\r]", ""))
      .cast("double") / nW
    val nSym = regexp_count(col(textCol), lit("#")) +
      regexp_count(col(textCol), lit("\\.\\.\\."))
    val symRatio = nSym.cast("double") / nW
    val alphaFrac = size(filter(t, w => regexp_count(w, lit("[A-Za-z]")) > 0))
      .cast("double") / nW
    val stopArr = array(GopherStopwords.map(lit): _*)
    val nStop = size(filter(t, w => array_contains(stopArr, w))).cast("bigint")
    val lines = split(col(textCol), "\n")
    val nL = size(lines).cast("double")
    val bulletFrac = size(filter(lines,
      l => substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast("double") / nL
    val ellipsisFrac = size(filter(lines,
      l => rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("double") / nL
    val okWords = nW >= minWords && nW <= maxWords
    val okMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val okSymbols = symRatio <= 0.1
    val okAlpha = alphaFrac >= 0.8
    val okStop = nStop >= 2
    val okBullets = bulletFrac <= 0.9
    val okEllipsis = ellipsisFrac <= 0.3
    docs.select(col(idCol).as("doc_id"),
      nW.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symRatio, 6).as("symbol_ratio"),
      round(alphaFrac, 6).as("alpha_frac"),
      nStop.as("n_stop"),
      okWords.as("ok_words"), okMeanLen.as("ok_mean_len"),
      okSymbols.as("ok_symbols"), okAlpha.as("ok_alpha"),
      okStop.as("ok_stop"), okBullets.as("ok_bullets"),
      okEllipsis.as("ok_ellipsis"),
      (okWords && okMeanLen && okSymbols && okAlpha && okStop &&
        okBullets && okEllipsis).as("keep"))
      .orderBy(col("doc_id"))
  }
}

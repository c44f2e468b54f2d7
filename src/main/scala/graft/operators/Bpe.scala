package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding TRAINING primitives (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL'16 §3.2): the first merge step of a BPE tokenizer is "count every
  * adjacent symbol pair across the corpus and pick the most frequent".
  *
  * The scale trick here is the one every real BPE trainer uses: pair
  * counting runs over the DISTINCT pre-token vocabulary weighted by
  * pre-token frequency, never over the raw token stream. A 100 TB corpus
  * has trillions of token occurrences but a vocabulary of maybe 10⁷
  * distinct pre-tokens, so the explode-pairs stage — the only super-linear
  * part — runs on an aggregate-sized table. One data-sized shuffle (the
  * vocabulary count); everything after is vocabulary-sized.
  */
object Bpe {

  /** Corpus-wide adjacent character-pair counts, the ranking a BPE
    * trainer's first merge reads. Pre-tokenization is
    * [[TextFunctions.PreTokenRe]] (GPT-2-style letter/digit/other runs),
    * so no pair spans a pre-token boundary — the invariant that makes BPE
    * merges local. Overlapping occurrences count separately ("aaa"
    * contributes "aa" twice), matching the reference algorithm's
    * position-wise count.
    *
    * Output: the top-`topK` (pair, pair_count) in (count DESC, pair)
    * order — deterministic total order, so any engine replays the exact
    * ranking. */
  def pairCounts(docs: DataFrame, topK: Int = 20,
      textCol: String = "text"): DataFrame = {
    val vocab = docs
      .select(explode(
        regexp_extract_all(col(textCol), lit(TextFunctions.PreTokenRe), lit(0)))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topK)
  }

  /** Separator for the wrapped symbol-sequence encoding used by
    * [[trainMerges]]. Every symbol is stored as `SEP sym SEP`, so a
    * symbol sequence [a, bc, d] is the single string `␟a␟␟bc␟␟d␟`.
    * The payoff: BPE's greedy left-to-right non-overlapping merge of an
    * adjacent pair (l, r) is EXACTLY a plain string
    * `replace(s, ␟l␟␟r␟ → ␟lr␟)` — both Spark's `replace` and DuckDB's
    * scan left-to-right over non-overlapping occurrences — and the
    * wrapping makes a cross-symbol-boundary match impossible without
    * regex lookarounds (which RE2, the oracle's engine, lacks).
    * Pre-tokens containing the separator byte are dropped up front
    * (engine and oracle alike); U+001F is a C0 control char that never
    * appears in text corpora. */
  val Sep = "\u001f"

  /** Full BPE merge-loop TRAINING (Sennrich, Haddow & Birch, ACL'16
    * §3.2, algorithm 1): starting from character symbols, repeat
    * `nMerges` times — count adjacent symbol pairs across the corpus
    * (weighted by pre-token frequency), merge the most frequent pair
    * everywhere, recount. Completes the tokenizer-training pipeline
    * stage that [[pairCounts]] (the first merge's ranking) begins.
    *
    * Scale shape: the ONE data-sized pass is the pre-token vocabulary
    * aggregation (same as [[pairCounts]]); it is persisted, and every
    * merge iteration runs over that vocabulary-sized table. The winning
    * pair per step is a 1-row driver action (bounded model state, the
    * k-means-centroid precedent).
    *
    * LINEAGE BOUND (`checkpointEvery`, default 8): each merge appends one
    * `replace` to the vocabulary plan, so without truncation iteration k
    * would re-apply a k-deep replace chain — O(nMerges² · vocab)
    * character work AND an unboundedly growing Catalyst plan, a planner
    * blow-up at real tokenizer sizes (nMerges ≈ 30k). Every
    * `checkpointEvery` merges the vocabulary is localCheckpoint'd (the
    * superseded checkpoint freed eagerly — the [[KMeans.initMaxMin]] /
    * Components loop discipline), capping the chain depth at K: per-
    * iteration work is O(K · vocab) characters and the total is
    * O(nMerges · K · vocab) — LINEAR in nMerges for fixed K. 0 disables
    * truncation (audit-only; semantics are identical either way,
    * spec-pinned at nMerges=16).
    *
    * Determinism: ties break (count DESC, lhs, rhs) — a total order, so
    * any engine replays the exact merge table; the DuckDB oracle unrolls
    * the same loop in SQL (the q81/q99 iteration recipe).
    *
    * Output: one row per merge, `(step, lhs, rhs, pair_count)` in step
    * order — the merge table a BPE tokenizer ships as its model. */
  def trainMerges(docs: DataFrame, nMerges: Int = 8,
      textCol: String = "text", checkpointEvery: Int = 8): DataFrame = {
    require(nMerges >= 1, "need at least one merge")
    val spark = docs.sparkSession
    val vocab0 = docs
      .select(explode(
        regexp_extract_all(col(textCol), lit(TextFunctions.PreTokenRe), lit(0)))
        .as("w"))
      .filter(!col("w").contains(Sep))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("w"), "(.)", Sep + "$1" + Sep).as("s"),
        col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lastCheckpoint: Option[DataFrame] = None
    try {
      var vocab = vocab0
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      for (step <- 1 to nMerges) {
        // symbol split: strip the outer SEPs, split on the doubled SEP
        // between symbols; sequence() guarded to >= 2 symbols (Spark's
        // sequence(1, 0) counts DOWN — it is not empty)
        val syms = split(trim(col("s"), Sep), Sep + Sep)
        val best = vocab
          .select(syms.as("syms"), col("freq"))
          .filter(size(col("syms")) >= 2)
          .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("lhs"),
              element_at(col("syms"), i + 1).as("rhs")))).as("p"),
            col("freq"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum(col("freq")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
          .limit(1)
          .collect()
        require(best.nonEmpty,
          s"vocabulary fully merged after ${step - 1} merges — lower nMerges")
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((step, l, r, c))
        vocab = vocab.withColumn("s",
          org.apache.spark.sql.functions.replace(col("s"),
            lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep)))
        // truncate the replace-chain lineage; skip after the LAST merge —
        // no further iteration would read the checkpoint
        if (checkpointEvery > 0 && step % checkpointEvery == 0 && step < nMerges) {
          val cp = vocab.localCheckpoint()
          lastCheckpoint.foreach(Components.freeLocalCheckpoint)
          lastCheckpoint = Some(cp)
          vocab = cp
        }
      }
      import spark.implicits._
      merges.result().toDF("step", "lhs", "rhs", "pair_count")
        .orderBy(col("step"))
    } finally {
      // the merge table is driver state by now — both the cache and the
      // last checkpoint can be released before returning
      vocab0.unpersist(blocking = false)
      lastCheckpoint.foreach(Components.freeLocalCheckpoint)
    }
  }

  /** ENCODE the corpus with a trained merge table — the apply side of the
    * tokenizer [[trainMerges]] trains: per document, the pre-token count,
    * the token count after applying the merges, the character mass
    * tokenized, and chars-per-token (the compression ratio a tokenizer
    * build is judged by — GPT-2's ≈ 4 on English).
    *
    * `merges` is the trained model in merge order — bounded driver state
    * (a tokenizer ships ~30k rows), the k-means-centroid precedent.
    *
    * Scale trick, same as the trainer's: the merges are applied to the
    * DISTINCT pre-token vocabulary once (each distinct pre-token's symbol
    * string takes the full merge chain, then one `size(split(...))`
    * counts its tokens), never to the raw token stream — a 100 TB corpus
    * re-encodes ~10⁷ vocabulary entries, not trillions of occurrences.
    * Per-doc totals are then ONE join of the scan-local pre-token stream
    * against the vocabulary-sized token-count table plus a doc-keyed
    * rollup. Documents with no pre-tokens (empty/whitespace-only) emit
    * zero counts with chars_per_token 0, not null.
    *
    * The merge chain is applied in CHUNKS of `checkpointEvery` replaces
    * with a localCheckpoint between chunks — the [[trainMerges]] lineage
    * discipline: a single folded expression of ~30k nested `replace`s
    * would blow the Catalyst tree (StackOverflow / codegen method-size)
    * before any work ran. 0 disables truncation (audit-only; identical
    * semantics, spec-pinned).
    *
    * Output: (doc_id, n_pretokens, n_tokens, n_chars, chars_per_token),
    * totally ordered — gated as q131 by replaying the training CTEs plus
    * this aggregation in DuckDB. */
  def encodeTokenCounts(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text",
      checkpointEvery: Int = 8): DataFrame = {
    val pre = docs
      .select(col(idCol), explode(
        regexp_extract_all(col(textCol), lit(TextFunctions.PreTokenRe), lit(0)))
        .as("w"))
      .filter(!col("w").contains(Sep))
    def applyChunk(df: DataFrame, chunk: Seq[(String, String)]): DataFrame =
      df.withColumn("s", chunk.foldLeft(col("s")) { case (s, (l, r)) =>
        org.apache.spark.sql.functions.replace(s,
          lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
      })
    val vocab0 = pre.select("w").distinct()
      .select(col("w"), regexp_replace(col("w"), "(.)", Sep + "$1" + Sep).as("s"))
    val chunks =
      if (checkpointEvery > 0) merges.grouped(checkpointEvery).toSeq
      else Seq(merges)
    // checkpoint BETWEEN chunks only — the last chunk stays lazy, so a
    // short merge table (the common gated case) adds no materialization.
    // Superseded checkpoints are freed eagerly (the trainMerges
    // discipline); the final one backs the returned plan and is reclaimed
    // by the harness's blanket sweep (the KMeans.fit convention).
    var mergedVocab = vocab0
    var lastCp: Option[DataFrame] = None
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      mergedVocab = applyChunk(mergedVocab, chunk)
      if (i < chunks.size - 1) {
        val cp = mergedVocab.localCheckpoint()
        lastCp.foreach(Components.freeLocalCheckpoint)
        lastCp = Some(cp)
        mergedVocab = cp
      }
    }
    val tokv = mergedVocab
      .select(col("w"),
        size(split(trim(col("s"), Sep), Sep + Sep)).cast("bigint").as("n_toks"))
    val perDoc = pre.join(tokv, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pretokens"),
        sum(col("n_toks")).as("n_tokens"),
        sum(length(col("w"))).cast("bigint").as("n_chars"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pretokens"), lit(0L)).as("n_pretokens"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(col("n_chars").cast("double") / col("n_tokens"), 6))
          .as("chars_per_token"))
      .orderBy(col(idCol))
  }
}

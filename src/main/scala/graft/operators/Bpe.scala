package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over a document corpus — BM25 (Robertson &
  * Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond",
  * FnTIR'09), the default lexical scoring function of every production
  * search stack (Lucene/Elasticsearch) and the standard sparse half of
  * hybrid LLM retrieval pipelines.
  *
  * Scale shape: tf and df are key-partitioned hash aggregates over the
  * token stream; the per-(doc, term) score joins tf against a BROADCAST
  * term-stats table (|query terms| rows) and a broadcast 1-row corpus
  * aggregate — so the only data-sized shuffles are the two aggregations,
  * both with map-side combine. No corpus-wide inverted index is
  * materialized for ad-hoc queries; a serving deployment persists `tf`
  * bucketed by term and reuses it across queries —
  * [[IncrementalPostings.appendCountsBucketed]] is that layout, and its
  * report plans with zero hash exchanges.
  */
object Search {

  /** BM25 top-k: (doc_id, score, n_hit_terms) for documents matching ≥ 1
    * query term, ranked by (score desc, doc_id).
    *
    * Determinism contract (oracle-replayable): per-(doc, term) partial
    * scores are rounded to 6 decimals and summed through DECIMAL — decimal
    * addition is exact and order-independent, unlike double addition, so
    * the total is bit-stable under any partitioning — then emitted as
    * double. idf is the standard smoothed ln(1 + (N−df+0.5)/(df+0.5)). */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), graft.functions.TextFunctions.WsRun)).as("term"))
      .filter(length(col("term")) > 0)
    // per-doc length and corpus stats (1 row, broadcast)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // tf for query terms only — the filter prunes the token stream BEFORE
    // the aggregation, so the tf shuffle carries query-matching rows only
    val tf = toks.filter(col("term").isInCollection(queryTerms))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    bm25Score(tf, dl, k, k1, b)
  }

  /** The BM25 scoring core over pre-computed state: query-term
    * (doc_id, term, tf) rows and per-doc lengths (doc_id, dl). Shared by
    * the one-shot [[bm25]] (which derives both from a token scan) and
    * the store-served [[IncrementalPostings.bm25Bucketed]] (which reads
    * both from bucketed tables the indexing dates already paid for —
    * Lucene's norms file, Spark-shaped). Corpus stats and per-term df
    * are aggregate-sized and broadcast; per-term partials round to 6 and
    * decimal-sum (the q74 determinism contract). */
  /** `allowed` is FILTERED retrieval (tenant/language/category-scoped
    * search): corpus statistics — n_docs, avgdl, df — stay CORPUS-wide
    * (the filter restricts WHO can be retrieved, not what the corpus
    * is: a document's BM25 score is a function of itself and the corpus
    * stats, never of the other candidates), and the allow-list
    * semi-joins the query-term tf rows before scoring, so the top-k is
    * exact over the filtered corpus. Scope the STORE itself (or the
    * `docs` input) instead when per-tenant statistics are wanted. */
  private[operators] def bm25Score(tf: DataFrame, dl: DataFrame, k: Int,
      k1: Double, b: Double,
      allowed: Option[DataFrame] = None): DataFrame = {
    val corpus = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val partial = round(
      idf * (col("tf") * (lit(k1) + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))),
      6)
    IncrementalStore.allowFilter(tf, allowed, "doc_id").join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), partial.cast("decimal(18,6)").as("s"))
      .groupBy("doc_id")
      .agg(sum(col("s")).cast("double").as("score"),
        count(lit(1)).as("n_hit_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** PMI collocation extraction — top-k adjacent word pairs by pointwise
    * mutual information (Church & Hanks, "Word Association Norms, Mutual
    * Information, and Lexicography", CL'90): PMI(a,b) =
    * ln P(a,b) − ln P(a) − ln P(b) with P(a,b) = c_ab/N_pairs and P(w) =
    * c_w/N_tokens. The classic corpus-analysis stage for multiword
    * expressions ("New York"), also the association measure behind
    * word2vec-era co-occurrence matrices; `minCount` is the standard
    * low-frequency guard (rare pairs otherwise dominate PMI).
    *
    * Determinism contract: PMI is computed as the DIFFERENCE of three lns
    * (same expression shape in the oracle — one big ratio would round
    * differently), rounded to 6; the output order
    * (pmi DESC, w1, w2) is total, so the LIMIT is replayable.
    *
    * Scale shape: bigrams come from a scan-local array transform (zip of
    * the token array with its own tail — no window, no per-doc shuffle);
    * then TWO map-side-combined hash aggregates (pair counts, unigram
    * counts). Both count tables are VOCABULARY-sized, not corpus-sized —
    * the joins run key-partitioned on aggregate output, and the two 1-row
    * totals broadcast. Nothing downstream of the scan is data-sized. */
  /** Inverted-index POSTINGS build — the batch indexing job behind every
    * lexical search deployment (Lucene segment build, impact-ordered
    * indexes): per term, document frequency (df), collection frequency
    * (cf), and the top-`k` postings ranked by (tf DESC, doc_id) — the
    * impact-ordered prefix that early-termination query evaluation (WAND)
    * reads first. One row per (term, rank) keeps the output fixed-width;
    * a serving store would group these rows into per-term lists on write.
    *
    * Scale shape: two map-side-combined hash aggregates — (term, doc)
    * then term — and ONE window on the term key for the top-k cut; all
    * shuffles are key-partitioned on term, reused by the final join. The
    * per-term partitions the window sees are postings lists, bounded by
    * df; stopword-sized terms make wide partitions but the window only
    * streams a row_number, so there is no quadratic term. */
  def postings(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    postingsFromTf(termFrequencies(docs, idCol, textCol), k)

  /** The (term, doc_id, tf) table — the additive state every index build
    * reduces to (also the unit [[IncrementalPostings]] persists per
    * ingestion date). */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(filter(graft.functions.TextFunctions.tokens(col(textCol)),
          w => length(w) > 0)).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** df/cf + top-k impact-ordered postings from a (term, doc_id, tf)
    * table — the report stage shared by the batch build and the
    * incremental store. */
  def postingsFromTf(tf: DataFrame, k: Int = 3): DataFrame = {
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("tf").desc, col("doc_id"))
    tf.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .join(stats, "term")
      .select(col("term"), col("df"), col("cf"),
        col("rnk").cast("bigint").as("rnk"), col("doc_id"), col("tf"))
      .orderBy(col("term"), col("rnk"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal
    * Rank Fusion outperforms Condorcet and individual Rank Learning
    * Methods", SIGIR'09): fuse any number of (id, rank) top-k lists into
    * one ranking by Σ 1/(kRrf + rank). THE standard hybrid-retrieval
    * combiner (BM25 list + vector list): rank-only fusion needs no score
    * calibration between heterogeneous retrievers, which is why hybrid
    * search stacks default to it (kRrf = 60 is the paper's constant).
    *
    * Output: (id, rrf_score, n_lists) in (score DESC, id) total order,
    * top `topK`.
    *
    * Determinism: each 1/(kRrf+rank) term is rounded to 6 and summed
    * through DECIMAL (order-independent — the repo's standard replay
    * contract); ties break on id.
    *
    * Scale shape: the inputs are already top-k lists (bounded rows), so
    * the fusion itself — a union plus one tiny aggregate — is free at any
    * corpus size; all the data-sized work lives in the upstream
    * retrievers, each with its own scale story. */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    rankings
      .map(_.select(col("id"),
        round(lit(1.0) / (lit(kRrf) + col("rank")), 6)
          .cast("decimal(18,6)").as("s")))
      .reduce(_ unionAll _)
      .groupBy(col("id"))
      .agg(sum(col("s")).cast("double").as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(topK)
  }

  def collocations(docs: DataFrame, minCount: Long = 5, k: Int = 50,
      textCol: String = "text"): DataFrame = {
    val t = filter(graft.functions.TextFunctions.tokens(col(textCol)),
      w => length(w) > 0)
    // adjacent pairs; sequence() is DESCENDING when start > stop, so docs
    // with < 2 tokens must short-circuit to null (explode drops them)
    val bg = docs.select(explode(when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"),
            element_at(t, i + 1).as("w2"))))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = docs.select(explode(t).as("w"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val cu = uni.groupBy("w").agg(count(lit(1)).as("c"))
    // totals from ONE scan-local aggregate over the array sizes — summing
    // the exploded streams again would re-run two explode+aggregate
    // passes just to produce two numbers (measured 4.97 → 4.38 s at
    // sf0.1; the remaining cost is the pair/unigram count explodes
    // themselves); nb counts size−1 pairs per ≥2-token doc, nu every
    // token
    val tot = docs.select(size(t).as("n"))
      .agg(sum(when(col("n") >= 2, col("n") - 1).otherwise(0))
          .cast("bigint").as("nb"),
        sum(coalesce(col("n"), lit(0))).cast("bigint").as("nu"))
    val pmi = round(
      log(col("n_pair").cast("double") / col("nb"))
        - log(col("c1").cast("double") / col("nu"))
        - log(col("c2").cast("double") / col("nu")), 6)
    cb.filter(col("n_pair") >= minCount)
      .join(cu.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(cu.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n_pair"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The STANDARD-STORE FAMILY REGISTRY behind [[graft.OpsMain]]: the
  * flag-named families a production deployment registers with the
  * operational triad ([[CurateJob]] / [[TakedownJob]] / [[MaintainJob]])
  * and the inventory, wired the way the oracle-gated compositions
  * (q181, q186) wire them by hand — with the safety hooks ON:
  * every curate family carries the `foldedThrough` retention fence
  * ([[StoreMaintenance.retentionHorizon]] over its backing tables — the
  * max of the fold horizon and the durable `_expired_through` policy
  * record, so a marker-deleted reprocess can neither double-count a
  * folded date nor resurrect an expired one), and the suppression feed
  * is [[graft.OpsMain]]'s job-level default.
  *
  * Families (the q181 trio — one lexical, one token-similarity, one
  * embedding-similarity):
  *   - `postings`: the bucketed BM25 store (`{store}_post` tf +
  *     `{store}_post_dl` norms) — fold with the additive tf merge.
  *   - `minhash`: the bucketed MinHash band store (`{store}_mh`); day
  *     report = the date's new candidate pairs as-of the date.
  *   - `semantic`: the incremental semantic near-dup store
  *     (`{store}_sem_*`); INIT-ON-DEMAND at the first append — the
  *     banding model must be frozen at a declared capacity, so the
  *     first curate run REQUIRES `--SEM_HORIZON` (a loud refusal beats
  *     a silently undersized frozen config); day report = the date's
  *     cosine pairs as-of the date; maintenance = the band-drift PSI
  *     audit (the store's folds are model-level operations — reband,
  *     migrate — that stay deliberate, not windowed).
  *   - `vectors`: the persisted ANN index ([[IncrementalVectors]] —
  *     PQ codes + IVF postings, `{store}_vec_*`); INIT-ON-DEMAND at
  *     the first append with the same declared-capacity law: the IVF
  *     quantizer freezes its cell count at init (size ≈ √(expected
  *     corpus rows) — the probe economics rest on it), so the first
  *     curate run REQUIRES `--VEC_CELLS`. Takedown = the q161 dual
  *     rewrite; maintenance = the cell-occupancy/skew + drift-PSI
  *     audit, with the detect→act POLICY
  *     ([[IncrementalVectors.maintainPolicy]]) armed by
  *     `--VEC_PSI_REFIT` (quantizer refit + store migration inside the
  *     window) and `--VEC_MAX_CELL_ROWS` (hot-cell split) — unarmed,
  *     acting stays a deliberate operator call, exactly like the
  *     semantic family's reband.
  *
  * Every closure routes through the families' own marker-committed
  * entry points, so the rewrite protocol (same-gen no-op, crash
  * resume, lease exclusion) is inherited, never re-implemented. */
object OpsFamilies {

  val Names: Seq[String] = Seq("postings", "minhash", "semantic", "vectors")

  /** Inventory view: (label, table) per backing per-date table. The
    * semantic `_cfg` table is model state (no `ds` partitions) and is
    * deliberately absent. */
  def tables(store: String, fam: String): Seq[(String, String)] =
    fam match {
      case "postings" => Seq(s"${fam}_tf" -> s"${store}_post",
        s"${fam}_norms" -> s"${store}_post_dl")
      case "minhash" => Seq(s"${fam}_bands" -> s"${store}_mh")
      case "semantic" => Seq(s"${fam}_bands" -> s"${store}_sem_bands",
        s"${fam}_vecs" -> s"${store}_sem_vecs",
        s"${fam}_occ" -> s"${store}_sem_occ")
      // the vec codebook/centroid tables are model state (no `ds`
      // partitions), absent like the semantic `_cfg`
      case "vectors" => Seq(s"${fam}_codes" -> s"${store}_vec_codes",
        s"${fam}_cells" -> s"${store}_vec_cells")
      case other => throw new IllegalArgumentException(
        s"unknown family '$other' — registered: ${Names.mkString(", ")}")
    }

  /** Curate registration. `idCol`/`textCol`/`vecCol` name the input
    * drop's columns; `pairThreshold`/`semThreshold` gate the day
    * reports; `semHorizon` is the semantic model's frozen capacity and
    * `vecCells` the vector index's frozen IVF cell count (each required
    * before its store exists, ignored after). */
  def curate(store: String, fam: String, idCol: String, textCol: String,
      vecCol: String, pairThreshold: Double, semThreshold: Double,
      semHorizon: Long, vecCells: Int = 0): CurateFamily = fam match {
    case "postings" => CurateFamily(fam,
      append = (slice, d) => {
        val docs = slice.select(col(idCol).as("doc_id"),
          col(textCol).as("text"))
        IncrementalPostings.appendCountsBucketed(docs, s"${store}_post", d)
        IncrementalPostings.appendNorms(docs, s"${store}_post", d)
      },
      drop = (sp, d) => IncrementalStore.dropDate(sp,
        Seq(s"${store}_post", s"${store}_post_dl"), d),
      foldedThrough = Some(sp => StoreMaintenance.retentionHorizon(sp,
        Seq(s"${store}_post", s"${store}_post_dl"))))
    case "minhash" => CurateFamily(fam,
      append = (slice, d) => IncrementalDedup.appendBandsBucketed(
        slice.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        s"${store}_mh", d),
      drop = (sp, d) =>
        IncrementalStore.dropDate(sp, Seq(s"${store}_mh"), d),
      report = Some((sp, d) => IncrementalDedup.newPairsBucketed(
        sp, s"${store}_mh", d, pairThreshold, upTo = Some(d))),
      foldedThrough = Some(sp =>
        StoreMaintenance.retentionHorizon(sp, Seq(s"${store}_mh"))),
      // empty-first-date guard: the day report scans the band table,
      // which only an append creates (CurateFamily.exists contract)
      exists = Some(sp => sp.catalog.tableExists(s"${store}_mh")))
    case "semantic" => CurateFamily(fam,
      append = (slice, d) => {
        val sp = slice.sparkSession
        val emb = slice.select(col(idCol).as("vec_id"), col(vecCol))
        if (!sp.catalog.tableExists(s"${store}_sem_cfg")) {
          require(semHorizon > 0,
            "the semantic store is uninitialized and SEM_HORIZON is " +
              "unset — the banding model freezes its width/levels at a " +
              "declared row capacity (the engagement law); pass " +
              "--SEM_HORIZON <expected corpus rows> on the first run")
          IncrementalSemantic.initModel(emb, s"${store}_sem", semHorizon,
            vecCol = vecCol)
        }
        IncrementalSemantic.appendDate(emb, s"${store}_sem", d,
          vecCol = vecCol)
      },
      drop = (sp, d) => IncrementalSemantic.dropDate(sp, s"${store}_sem", d),
      report = Some((sp, d) => IncrementalSemantic.newPairs(
        sp, s"${store}_sem", d, semThreshold, upTo = Some(d))),
      foldedThrough = Some(sp => StoreMaintenance.retentionHorizon(sp,
        Seq(s"${store}_sem_bands", s"${store}_sem_vecs",
          s"${store}_sem_occ"))),
      // empty-first-date guard: the pair report scans bands+vecs, which
      // only an append creates (initModel writes just the _cfg table)
      exists = Some(sp => sp.catalog.tableExists(s"${store}_sem_bands") &&
        sp.catalog.tableExists(s"${store}_sem_vecs")))
    case "vectors" => CurateFamily(fam,
      append = (slice, d) => {
        val sp = slice.sparkSession
        val emb = slice.select(col(idCol).as("vec_id"), col(vecCol))
        if (!sp.catalog.tableExists(s"${store}_vec_cb")) {
          require(vecCells > 0,
            "the vector store is uninitialized and VEC_CELLS is unset — " +
              "the IVF coarse quantizer freezes its cell count at init " +
              "and the ≈nProbe/nCells probe economics rest on it (size " +
              "≈ √(expected corpus rows)); pass --VEC_CELLS on the " +
              "first run")
          IncrementalVectors.initModel(emb, s"${store}_vec",
            nCells = vecCells, vecCol = vecCol)
        }
        IncrementalVectors.appendDate(emb, s"${store}_vec", d,
          vecCol = vecCol)
      },
      drop = (sp, d) =>
        IncrementalVectors.dropDate(sp, s"${store}_vec", d),
      foldedThrough = Some(sp => StoreMaintenance.retentionHorizon(sp,
        Seq(s"${store}_vec_codes", s"${store}_vec_cells"))))
    case other => throw new IllegalArgumentException(
      s"unknown family '$other' — registered: ${Names.mkString(", ")}")
  }

  /** Takedown registration — every family here is id-keyed (anti-join
    * deletes), so none is `subtractive`. */
  def takedown(spark: SparkSession, store: String,
      fam: String): TakedownFamily = fam match {
    case "postings" => TakedownFamily(fam, (ids, gen) =>
      IncrementalPostings.deleteDocs(spark, s"${store}_post", ids, gen))
    case "minhash" => TakedownFamily(fam, (ids, gen) =>
      IncrementalDedup.deleteDocs(spark, s"${store}_mh", ids, gen))
    case "semantic" => TakedownFamily(fam, (ids, gen) =>
      IncrementalSemantic.deleteIds(spark, s"${store}_sem", ids, gen))
    case "vectors" => TakedownFamily(fam, (ids, gen) =>
      IncrementalVectors.deleteIds(spark, s"${store}_vec", ids, gen))
    case other => throw new IllegalArgumentException(
      s"unknown family '$other' — registered: ${Names.mkString(", ")}")
  }

  /** Maintenance registration. `retainTo(window)` is the optional
    * retention policy cutoff ([[MaintainFamily.expire]] — run AFTER
    * the folds, the aligned-horizons ordering). */
  def maintain(store: String, fam: String,
      retainTo: Option[String => String],
      vecMaxCellRows: Option[Long] = None,
      vecPsiRefit: Option[Double] = None): MaintainFamily = {
    def expireAll(tbls: Seq[String]): Option[
        (SparkSession, String) => StoreMaintenance.ExpireResult] =
      retainTo.map(cut => (sp: SparkSession, w: String) => {
        val rs = tbls.filter(sp.catalog.tableExists)
          .map(t => StoreMaintenance.expire(sp, t, cut(w)))
        StoreMaintenance.ExpireResult(
          rs.flatMap(_.dropped).distinct.sorted,
          rs.flatMap(_.retained).distinct.sorted)
      })
    fam match {
      case "postings" => MaintainFamily(fam,
        maintain = (sp, w) => {
          StoreMaintenance.compact(sp, s"${store}_post", w,
            merge = _.groupBy("term", "doc_id").agg(sum(col("tf")).as("tf")))
          IncrementalPostings.compactNorms(sp, s"${store}_post", w)
        },
        expire = expireAll(Seq(s"${store}_post", s"${store}_post_dl")),
        audit = Some((sp, _) => sp.table(s"${store}_post")
          .agg(countDistinct(col("term")).as("n_terms"),
            countDistinct(col("doc_id")).as("n_docs"))))
      case "minhash" => MaintainFamily(fam,
        maintain = (sp, w) =>
          StoreMaintenance.compact(sp, s"${store}_mh", w),
        expire = expireAll(Seq(s"${store}_mh")))
      case "semantic" => MaintainFamily(fam,
        // model-level folds (reband, migrate) stay deliberate; the
        // window contributes the drift AUDIT — detect, then a human
        // (or a policy job) acts
        maintain = (_, _) => (),
        expire = expireAll(Seq(s"${store}_sem_bands",
          s"${store}_sem_vecs", s"${store}_sem_occ")),
        audit = Some((sp, _) => {
          // baseline = earliest plain date; after a gen rewrite the
          // r_<gen> label is the natural new baseline (its scaladoc
          // rule). No auditable state at all — store uninitialized,
          // expiry emptied it, rewrite uncommitted — yields an EMPTY,
          // correctly-shaped report: an audit describes the store, it
          // must never wedge the window it reports on.
          val occ = s"${store}_sem_occ"
          val parts = if (sp.catalog.tableExists(occ))
            sp.sql(s"SHOW PARTITIONS $occ").collect()
              .map(_.getString(0).stripPrefix("ds=")).toSeq
          else Seq.empty[String]
          parts.filterNot(p => p.startsWith("c_") || p.startsWith("r_"))
            .minOption
            .orElse(parts.filter(_.startsWith("r_")).maxOption)
            .fold(sp.sql("SELECT CAST('' AS STRING) AS ds, " +
              "CAST(0 AS INT) AS level, CAST(0 AS BIGINT) AS n_rows, " +
              "CAST(0.0 AS DOUBLE) AS psi").limit(0))(init =>
              IncrementalSemantic.bandDriftPsiLevels(sp, s"${store}_sem",
                init))
        }))
      case "vectors" => MaintainFamily(fam,
        // the detect→act POLICY ([[IncrementalVectors.maintainPolicy]]):
        // unarmed (both thresholds None) it is a no-op and acting stays
        // a deliberate call; armed, the refit/split rewrites run INSIDE
        // the window — lease-fenced and marker-committed by the acts'
        // own protocols, window-unique gens, crash-resume pinned in
        // OpsMainSpec
        maintain = (sp, w) => {
          IncrementalVectors.maintainPolicy(sp, s"${store}_vec", w,
            maxCellRows = vecMaxCellRows, psiRefit = vecPsiRefit)
          ()
        },
        expire = expireAll(Seq(s"${store}_vec_codes",
          s"${store}_vec_cells")),
        audit = Some((sp, _) => {
          // one frame, two sections: per-cell occupancy/skew ("occ")
          // and per-date drift PSI ("psi") — (kind, key, n_rows, value).
          // Empty-but-shaped on an uninitialized store (the semantic
          // audit's never-wedge rule).
          val empty = sp.sql("SELECT CAST('' AS STRING) AS kind, " +
            "CAST('' AS STRING) AS key, CAST(0 AS BIGINT) AS n_rows, " +
            "CAST(0.0 AS DOUBLE) AS value").limit(0)
          if (!sp.catalog.tableExists(s"${store}_vec_cells")) empty
          else IncrementalVectors.cellAudit(sp, s"${store}_vec")
            .select(lit("occ").as("kind"),
              col("cell").cast("string").as("key"),
              col("n_vectors").as("n_rows"), col("skew").as("value"))
            .unionAll(IncrementalVectors
              .cellDriftPsi(sp, s"${store}_vec")
              .select(lit("psi").as("kind"), col("ds").as("key"),
                col("n_vectors").as("n_rows"), col("psi").as("value")))
        }))
      case other => throw new IllegalArgumentException(
        s"unknown family '$other' — registered: ${Names.mkString(", ")}")
    }
  }
}

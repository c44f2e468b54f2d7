package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IncrementalComponentsSpec extends SparkSpec {

  private def freshBase(): String =
    Files.createTempDirectory("inccomp").toString

  private def paths(base: String) =
    (s"$base/sigs", s"$base/labels", s"$base/repmap")

  test("incremental labels equal from-scratch clustering on the fixture") {
    val docs = Tables.load(spark, sf, "documents")
    val base = freshBase()
    val (sigs, labels, repmap) = paths(base)
    (0 until 3).foreach { d =>
      IncrementalComponents.processDate(spark,
        docs.filter(pmod(col("doc_id"), lit(3L)) === d), docs,
        sigs, labels, repmap, s"d$d")
    }
    val inc = IncrementalComponents.currentLabels(spark, labels, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Components.connected(Dedup.minhashLsh(docs, 0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == batch,
      s"incremental ${inc.size} vs batch ${batch.size}; " +
        s"missing=${(batch -- inc).take(5)} extra=${(inc -- batch).take(5)}")
  }

  test("a later bridge doc merges two established clusters through the rep map") {
    import spark.implicits._
    val w = (1 to 10).map(i => s"w$i").mkString(" ")
    val v = (1 to 10).map(i => s"v$i").mkString(" ")
    val bridge = s"$w $v" // 3-gram Jaccard ≈ 0.44 to each side
    val all = Seq((1L, w), (2L, v), (4L, w), (5L, v), (3L, bridge))
      .toDF("doc_id", "text")
    val byDate = Map(
      "d0" -> Seq(1L, 2L), // two dissimilar docs — no pairs yet
      "d1" -> Seq(4L, 5L), // exact dups → clusters {1,4} and {2,5}
      "d2" -> Seq(3L))     // bridge similar to BOTH → one cluster
    val base = freshBase()
    val (sigs, labels, repmap) = paths(base)
    Seq("d0", "d1", "d2").foreach { d =>
      IncrementalComponents.processDate(spark,
        all.filter(col("doc_id").isin(byDate(d): _*)), all,
        sigs, labels, repmap, d, threshold = 0.4)
    }
    val cur = IncrementalComponents.currentLabels(spark, labels, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cur == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L),
      s"expected one merged component rooted at 1, got $cur")
    // the merge must be recorded as a rep-map entry (2 → 1), not a rewrite
    // of doc 5's immutable (rep0 = 2) row
    val rm = IncrementalComponents.currentRepmap(spark, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rm.get(2L).contains(1L), s"repmap must chain 2 -> 1, got $rm")
    val lab5 = IncrementalComponents.loadLabels(spark, labels)
      .filter(col("id") === 5L).select(col("rep0")).head().getLong(0)
    assert(lab5 == 2L, "stored first-label rows are immutable")
  }

  test("re-running an already-ingested date is a no-op") {
    import spark.implicits._
    val all = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val base = freshBase()
    val (sigs, labels, repmap) = paths(base)
    IncrementalComponents.processDate(spark,
      all.filter(col("doc_id") === 1L), all, sigs, labels, repmap, "d0")
    IncrementalComponents.processDate(spark,
      all.filter(col("doc_id") === 2L), all, sigs, labels, repmap, "d1")
    val before = IncrementalComponents.currentLabels(spark, labels, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // crash-replay: the same date processed twice must not duplicate
    // labels or disturb the map (contracted edges all collapse)
    IncrementalComponents.processDate(spark,
      all.filter(col("doc_id") === 2L), all, sigs, labels, repmap, "d1")
    val after = IncrementalComponents.currentLabels(spark, labels, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before && after == Set((1L, 1L), (2L, 1L)))
  }

  test("compaction folds label partitions, preserves labels, prunes repmap") {
    val docs = Tables.load(spark, sf, "documents")
    val base = freshBase()
    val (sigs, labels, repmap) = paths(base)
    (0 until 3).foreach { d =>
      IncrementalComponents.processDate(spark,
        docs.filter(pmod(col("doc_id"), lit(3L)) === d), docs,
        sigs, labels, repmap, s"d$d")
    }
    val before = IncrementalComponents.currentLabels(spark, labels, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def dsDirs(): Seq[String] = new java.io.File(labels).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    val nBefore = dsDirs().size
    IncrementalComponents.compactLabels(spark, labels, "d2")
    IncrementalComponents.pruneRepmapVersions(spark, repmap)
    assert(dsDirs() == Seq("ds=c_d2"), s"expected one fold, got ${dsDirs()}")
    assert(nBefore >= 2)
    val after = IncrementalComponents.currentLabels(spark, labels, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "compaction must re-bin partitions, not rows")
    // idempotent: a second pass with the same horizon is a no-op
    IncrementalComponents.compactLabels(spark, labels, "d2")
    assert(dsDirs() == Seq("ds=c_d2"))
  }

  test("store paths resolve through the Hadoop FileSystem, not java.io.File") {
    import spark.implicits._
    // a file:-URI path is a valid Hadoop Path that java.io.File can never
    // probe (new java.io.File("file:/tmp/x").exists() is always false) —
    // the exact shape of every non-local deployment (hdfs://, s3a://).
    // Before the fix, loadLabels on such a store silently returned EMPTY
    // and a second processDate re-clustered from scratch.
    val t = (1 to 10).map(i => s"p$i").mkString(" ")
    val all = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val base = "file:" + freshBase()
    val (sigs, labels, repmap) = paths(base)
    IncrementalComponents.processDate(spark,
      all.filter(col("doc_id") === 1L), all, sigs, labels, repmap, "d0")
    IncrementalComponents.processDate(spark,
      all.filter(col("doc_id") === 2L), all, sigs, labels, repmap, "d1")
    // d1's pair (1,2) only clusters if d1 SAW d0's signature store — i.e.
    // if the existence probe resolved the file:-URI store as present
    val cur = IncrementalComponents.currentLabels(spark, labels, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cur == Set((1L, 1L), (2L, 1L)),
      s"file:-URI store must accumulate across dates, got $cur")
  }

  test("a crash between marker and drops resumes to the same state") {
    import spark.implicits._
    val t = (1 to 10).map(i => s"t$i").mkString(" ")
    val all = Seq((1L, t), (2L, t), (4L, t)).toDF("doc_id", "text")
    val base = freshBase()
    val (sigs, labels, repmap) = paths(base)
    IncrementalComponents.processDate(spark,
      all.filter(col("doc_id") <= 2L), all, sigs, labels, repmap, "d0")
    IncrementalComponents.processDate(spark,
      all.filter(col("doc_id") === 4L), all, sigs, labels, repmap, "d1")
    IncrementalComponents.compactLabels(spark, labels, "d1")
    // simulate the crash window: marker written, olds not yet dropped —
    // recreate an "old" partition next to the committed fold + marker
    IncrementalComponents.loadLabels(spark, labels)
      .filter(col("id") === 4L).select(col("id"), col("rep0"))
      .withColumn("ds", lit("d1"))
      .write.mode("overwrite").partitionBy("ds")
      .option("partitionOverwriteMode", "dynamic").parquet(labels)
    new java.io.File(labels, "_compact_c_d1_done").createNewFile()
    IncrementalComponents.compactLabels(spark, labels, "d1")
    val dirs = new java.io.File(labels).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("ds=c_d1"), s"resume must finish the drops: $dirs")
    assert(!new java.io.File(labels, "_compact_c_d1_done").exists())
    val cur = IncrementalComponents.currentLabels(spark, labels, repmap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cur == Set((1L, 1L), (2L, 1L), (4L, 1L)))
  }
}

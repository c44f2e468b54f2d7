package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the MEASURED resident-state row for PLAID serving (the
  * round-16 verdict's Next #5). The 64 B vs 264 B per-token-vector claim
  * behind `ivfSearchReconstructed` was arithmetic; this probe makes it
  * evidence: build the q175 serving stack (vector store + SQ8 code
  * store) over 10×-scaled token vectors, then run the SAME
  * nominate→MaxSim-re-rank serve twice under the MemProbe squeeze
  * (4 GiB heap via SPARK_DRIVER_MEM, `spark.memory.fraction` cut):
  *   - COMPRESSED (the q175 path): nomination from centroids + (cell,id)
  *     membership, candidates and the re-rank scored from SQ8
  *     reconstructions — the float token vectors never load;
  *   - FLOAT-RESIDENT (the q171 path): nomination scoring the cell
  *     store's inline float vectors, re-rank gathering float tokens.
  * Per side it records wall seconds, spill counters, PEAK per-task
  * execution memory, and — the resident-state claim itself — the
  * measured INPUT BYTES the serve scanned (the cells' float `e` column
  * vs the uint8 code rows). Both must complete with zero task failures
  * under the ceiling; the bytes/peak delta is the claim, measured.
  *
  * Usage: SPARK_DRIVER_MEM=4g SPARK_GRAFT_SCALE=10
  *          sbt "runMain graft.PlaidMemProbe" */
object PlaidMemProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val frac = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.fraction", frac)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val big = ScaleProbe.ensureScaledTables(spark, n, Some(Set("embeddings")))
    val emb = Tables.load(spark, big, "embeddings")
    def slice(d: Int) = emb.filter(pmod(col("vec_id"), lit(3L)) === d)

    val vecBase = "graft_plaidprobe_vec"
    val sqBase = "graft_plaidprobe_sq"
    val vecTbls = Seq("_cb", "_ctr", "_codes", "_cells", "_map")
      .map(vecBase + _)
    val sqTbls = Seq("_grid", "_codes").map(sqBase + _)
    (vecTbls ++ sqTbls).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    println(s"PlaidMemProbe: building stores over $big " +
      s"(${emb.count()} token vectors), heap " +
      s"${Runtime.getRuntime.maxMemory() / (1 << 20)}MB, fraction $frac")
    graft.operators.IncrementalVectors.initModel(slice(0), vecBase)
    (0 until 3).foreach(d =>
      graft.operators.IncrementalVectors.appendDate(slice(d), vecBase, s"d$d"))
    graft.operators.IncrementalSQ.initGrid(slice(0), sqBase)
    (0 until 3).foreach(d =>
      graft.operators.IncrementalSQ.appendDate(slice(d), sqBase, s"d$d"))

    // the RESIDENT-STATE comparison itself: bytes a serving fleet must
    // hold (or scan) per store table — float cells (inline e/n columns)
    // vs the compressed serve's membership + uint8 codes
    def tableBytes(t: String): Long = {
      val root = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
        .location)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(root).getLength
    }
    val cellsB = tableBytes(s"${vecBase}_cells")
    val memberB = // the two columns the compressed nomination reads
      spark.table(s"${vecBase}_cells").select(col("cell"), col("id"))
        .write.mode("overwrite")
        .parquet("/tmp/graft_plaidprobe_member") match { case _ =>
        val p = new org.apache.hadoop.fs.Path("/tmp/graft_plaidprobe_member")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      }
    val codesB = tableBytes(s"${sqBase}_codes")
    println(f"store bytes: float cells ${cellsB / 1024}%d KB vs " +
      f"membership ${memberB / 1024}%d KB + uint8 codes ${codesB / 1024}%d KB " +
      f"(= ${(memberB + codesB) / 1024}%d KB, " +
      f"${cellsB.toDouble / (memberB + codesB)}%.2fx smaller)")

    object metrics extends SparkListener {
      @volatile var memSpilled = 0L
      @volatile var diskSpilled = 0L
      @volatile var peakExecMem = 0L
      @volatile var inputBytes = 0L
      @volatile var failedTasks = 0
      def reset(): Unit = {
        memSpilled = 0; diskSpilled = 0; peakExecMem = 0
        inputBytes = 0; failedTasks = 0
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        if (t.taskMetrics != null) {
          memSpilled += t.taskMetrics.memoryBytesSpilled
          diskSpilled += t.taskMetrics.diskBytesSpilled
          inputBytes += t.taskMetrics.inputMetrics.bytesRead
          peakExecMem = math.max(peakExecMem, t.taskMetrics.peakExecutionMemory)
        }
        if (!t.reason.toString.startsWith("Success")) failedTasks += 1
      }
    }
    spark.sparkContext.addSparkListener(metrics)

    val queries = emb.filter(col("vec_id") < 24)
    val qtok = graft.operators.LateInteraction.tokenView(emb)
      .filter(col("doc") < 3)
    def candOf(nom: DataFrame): DataFrame =
      nom.select(expr("qid div 8").as("qdoc"), expr("cid div 8").as("cdoc"))
        .filter(col("qdoc") =!= col("cdoc")).distinct()
    def run(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def serveCompressed(): Unit = {
      // the q175 stack: membership-only nomination, SQ8-reconstructed
      // candidate scoring, re-rank from the same reconstructions
      val recon = graft.operators.SQ.reconstruct(
        spark.table(s"${sqBase}_codes")
          .select(col("id"), col("dim"), col("code")),
        spark.table(s"${sqBase}_grid"))
      val nom = graft.operators.IncrementalVectors.ivfSearchReconstructed(
        spark, vecBase, queries, recon, kNeighbors = 8)
      run(graft.operators.LateInteraction
        .rerankReconstructed(recon, qtok, candOf(nom)))
    }
    def serveFloat(): Unit = {
      // the q171 stack: nomination scoring the cell store's inline
      // float vectors, re-rank gathering float token vectors
      val nom = graft.operators.IncrementalVectors.ivfSearch(
        spark, vecBase, queries, kNeighbors = 8)
      run(graft.operators.LateInteraction.rerank(
        graft.operators.LateInteraction.tokenView(emb), qtok, candOf(nom)))
    }
    println(f"${"serve"}%-18s ${"sec"}%8s ${"spill-mem MB"}%13s " +
      f"${"spill-disk MB"}%14s ${"peak-task MB"}%13s ${"input MB"}%9s " +
      f"${"failed"}%7s")
    Seq(("compressed", () => serveCompressed()),
        ("float-resident", () => serveFloat())).foreach { case (label, f) =>
      f() // warm (JIT + broadcast caches), unmeasured
      sweep()
      val drained0 = org.apache.spark.graftbridge.ListenerBridge
        .drainListenerBus(spark.sparkContext)
      if (!drained0) System.err.println(s"[plaidprobe] $label: warm drain timed out")
      metrics.reset()
      val t0 = System.nanoTime()
      f()
      val dt = (System.nanoTime() - t0) / 1e9
      val drained = org.apache.spark.graftbridge.ListenerBridge
        .drainListenerBus(spark.sparkContext)
      if (!drained) System.err.println(s"[plaidprobe] $label: drain timed out")
      println(f"$label%-18s $dt%8.1f ${metrics.memSpilled / (1 << 20)}%13d " +
        f"${metrics.diskSpilled / (1 << 20)}%14d " +
        f"${metrics.peakExecMem / (1 << 20)}%13d " +
        f"${metrics.inputBytes / (1 << 20)}%9d ${metrics.failedTasks}%7d")
      sweep()
    }
    (vecTbls ++ sqTbls).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}

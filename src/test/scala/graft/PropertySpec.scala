package graft

import graft.functions.{Fnv64, ShingleHashes, TextFunctions}
import graft.split.Splitter
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.nio.file.Files

/** Property-based invariants (SURVEY.md §5): randomized inputs against
  * reference implementations and algebraic laws. Raw scalacheck runner
  * (scalatestplus bridge isn't in the offline dependency set). */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val doc = Gen.listOf(word).map(_.mkString(" "))

  test("Fnv64 expression equals the scalar reference on arbitrary strings") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(20, Gen.asciiPrintableStr)) { (ss: List[String]) =>
      val got = ss.distinct.toDF("s").withColumn("fp", Fnv64.fnv64(col("s")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      ss.forall(s => got(s) == Fnv64.hash(s.getBytes("UTF-8")))
    }, n = 10)
  }

  test("ShingleHashes cardinality equals distinct string-shingle cardinality") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(10, doc)) { (docs: List[String]) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val viaHash = df.select(size(ShingleHashes.shingleHashes(col("text"), 3)).as("n"))
        .collect().map(_.getInt(0)).toSeq
      val viaString = df.select(size(TextFunctions.shingles(col("text"), 3)).as("n"))
        .collect().map(_.getInt(0)).toSeq
      viaHash == viaString
    }, n = 10)
  }

  test("blocked near-dup equals all-pairs on random vectors at random block counts") {
    import spark.implicits._
    import graft.operators.Similarity
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f))
      .map(_.toArray).suchThat(v => v.exists(_ != 0f))
    check(Prop.forAll(Gen.listOfN(25, vecGen), Gen.chooseNum(1, 6)) {
      (vs: List[Array[Float]], nBlocks: Int) =>
        val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding")
        val brute = Similarity.cosineNearDup(df, 0.2).collect().toSet
        val blocked = Similarity.cosineNearDupBlocked(df, 0.2, nBlocks).collect().toSet
        brute == blocked
    }, n = 8)
  }

  test("ShingleRows generator equals the split/sequence formulation on arbitrary docs") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(8, Gen.oneOf(doc, Gen.const(""), Gen.const("  a  b ")))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val viaGen = df.select(col("id"),
          graft.functions.ShingleRows.shingleRows(col("text"), 3).as(Seq("pos", "s3")))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val viaArray = df
        .select(col("id"), split(trim(col("text")), "\\s+").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("id"), explode(sequence(lit(0), size(col("t")) - 3)).as("pos"), col("t"))
        .select(col("id"), col("pos"), concat_ws(" ",
          element_at(col("t"), col("pos") + 1),
          element_at(col("t"), col("pos") + 2),
          element_at(col("t"), col("pos") + 3)).as("s3"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      viaGen == viaArray
    }, n = 15)
  }

  test("Quant8F equals the transform() HOF formulation on the embeddings table") {
    val e = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm", graft.functions.VectorExpressions.normF(col("embedding")))
    val native = e.select(col("vec_id"),
      graft.functions.VectorExpressions.quant8F(col("embedding"), col("nrm")).as("q8"))
    val hof = e.select(col("vec_id"),
      array_join(transform(col("embedding"),
        x => round(x.cast("double") * lit(127) / col("nrm"), 0)
          .cast("int").cast("string")), ",").as("q8"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native quantization must be bit-identical to the HOF formulation")
  }

  test("CharNgramRows equals the transform(sequence) HOF formulation") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(20, Gen.asciiPrintableStr)) { (ss: List[String]) =>
      val df = ss.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val viaGen = df.select(col("id"),
          graft.functions.CharNgramRows.charNgramRows(col("text"), 3).as("tri"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      val viaHof = df.select(col("id"), lower(trim(col("text"))).as("t"))
        .filter(length(col("t")) >= 3)
        .select(col("id"), explode(
          expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")).as("tri"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      viaGen == viaHof
    }, n = 15)
  }

  test("CharNgramRows counts code points, not UTF-16 units (non-BMP parity with HOF)") {
    import spark.implicits._
    // 😀 is a surrogate pair: substring()-style code-point semantics must
    // treat it as ONE gram position, never split it
    val df = Seq((1L, "a😀b"), (2L, "😀😁😂x"))
      .toDF("id", "text")
    val viaGen = df.select(col("id"),
        graft.functions.CharNgramRows.charNgramRows(col("text"), 3).as("tri"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val viaHof = df.select(col("id"), lower(trim(col("text"))).as("t"))
      .filter(length(col("t")) >= 3)
      .select(col("id"), explode(
        expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")).as("tri"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(viaGen == viaHof, s"gen=$viaGen hof=$viaHof")
    assert(viaGen.map(_._2).forall(g => g.codePointCount(0, g.length) == 3),
      "every gram must be exactly 3 code points")
  }

  test("Quant8F quantizes degenerate vectors (zero norm) to null, not a crash") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(0f, 0f, 0f)),        // all-zero → norm 0 → null
      (2L, Array(3f, 4f))             // healthy → "76,102" (127·3/5, 127·4/5)
    ).toDF("vec_id", "embedding")
      .withColumn("nrm", graft.functions.VectorExpressions.normF(col("embedding")))
      .withColumn("q8", graft.functions.VectorExpressions
        .quant8F(col("embedding"), col("nrm")))
    val rows = d.select("vec_id", "q8").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) == null, "zero-norm vector must quantize to null")
    assert(rows(2L) == "76,102")
  }

  test("hash-mod sampling is invariant to partitioning (content-addressed)") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(30, Gen.asciiPrintableStr)) { (ss: List[String]) =>
      val df = ss.distinct.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def sample(d: org.apache.spark.sql.DataFrame) =
        d.select(col("doc_id"))
          .where(pmod(Fnv64.fnv64(col("text")), lit(100L)) < 30)
          .collect().map(_.getLong(0)).toSet
      sample(df.repartition(1)) == sample(df.repartition(7))
    }, n = 8)
  }

  test("split preserves the row multiset and emits single-key files (random tables)") {
    import spark.implicits._
    val keyGen = Gen.oneOf("k1", "k2", "k3", "k4")
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(keyGen, Gen.chooseNum(0L, 100L)))) {
      (rows: List[(String, Long)]) =>
        val tmp = Files.createTempDirectory("prop-split").toString
        val df = rows.toDF("item_id", "v")
        val outputs = new Splitter(spark).writeGroups(df, s"$tmp/out", "d1")
        val back = spark.read.parquet(s"$tmp/out/*/d1.parquet")
        val multisetOk = back.count() == df.count() &&
          df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty
        val singleKeyOk = outputs.forall { p =>
          spark.read.parquet(p).select("item_id").distinct().count() == 1
        }
        multisetOk && singleKeyOk
    }, n = 5)
  }

  test("removeRepeatedSpans conservation laws on random corpora") {
    import spark.implicits._
    import graft.operators.Corpus
    // small vocabulary + short docs => repeated 3-token windows actually
    // occur; n=3 spans keep the generated cases meaningful
    val smallWord = Gen.oneOf("aa", "bb", "cc", "dd")
    val smallDoc = Gen.listOfN(8, smallWord).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(6, smallDoc)) { (texts: List[String]) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Corpus.removeRepeatedSpans(df, n = 3).collect()
      out.forall { r =>
        val (nTok, nRem, nSp, clean) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
        val cleanToks = clean.split(" ").filter(_.nonEmpty)
        // removed tokens + surviving tokens partition the document; spans
        // are maximal so there are never more spans than removed tokens,
        // and cleaned text is a subsequence of the original tokens
        nRem <= nTok && cleanToks.length == nTok - nRem &&
          nSp <= nRem && (nSp > 0) == (nRem > 0) &&
          isSubsequence(cleanToks,
            texts(r.getLong(0).toInt).split("\\s+").filter(_.nonEmpty))
      }
    }, n = 15)
  }

  private def isSubsequence(sub: Array[String], full: Array[String]): Boolean = {
    var i = 0
    full.foreach { w => if (i < sub.length && sub(i) == w) i += 1 }
    i == sub.length
  }

  test("rankHash is scale/offset invariant and bounded on random strips") {
    import graft.multimodal.Multimodal
    val strip = Gen.listOfN(8, Gen.chooseNum(0, 100))
    check(Prop.forAll(strip) { (px: List[Int]) =>
      val bytes = px.map(_.toByte).toArray
      val h = Multimodal.rankHash(bytes)
      // any strictly-monotone remap staying in unsigned range preserves it
      val remapped = px.map(v => (2 * v + 3).toByte).toArray
      val diagonalClear = (0 until 8).forall(j => ((h >>> (8 * j + j)) & 1L) == 0L)
      h >= 0 && diagonalClear && Multimodal.rankHash(remapped) == h
    }, n = 30)
  }

  test("frame phash pipeline: decoded-pixel hashes equal closed-form hashes") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    // the engine hashes LZW-DECODED pixels; this recomputes the hash from
    // the closed-form pixel definition (text bytes cycled) — the exact
    // parity the q103 oracle relies on, here over random text
    check(Prop.forAll(Gen.listOfN(4, Gen.asciiPrintableStr)) { (texts: List[String]) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      implicit val s = spark
      val got = Multimodal.framePerceptualHashes(Multimodal.withContentPayload(df))
        .collect().map(f => (f.media_id, f.frame_idx) -> f.phash).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val b = t.getBytes("UTF-8")
        val nf = b.length % 30 + 1
        (0 until nf).forall { fi =>
          val px = Array.tabulate(8)(j =>
            if (b.isEmpty) 0.toByte else b((8 * fi + j) % b.length))
          got((i.toLong, fi.toLong)) == Multimodal.rankHash(px)
        }
      }
    }, n = 10)
  }
}

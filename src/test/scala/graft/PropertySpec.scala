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
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FingerprintSpec extends SparkSpec {

  // Published FNV-1a 64-bit test vectors (public domain reference values).
  private val vectors = Seq(
    "" -> 0xcbf29ce484222325L,
    "a" -> 0xaf63dc4c8601ec8cL,
    "foobar" -> 0x85944171f73967e8L)

  test("Fnv64 matches published FNV-1a test vectors (interpreted path)") {
    vectors.foreach { case (in, want) =>
      assert(Fnv64.hash(in.getBytes("UTF-8")) == want, s"input '$in'")
    }
  }

  test("Fnv64 codegen path agrees with interpreted eval and scalar impl") {
    import spark.implicits._
    val df = vectors.map(_._1).toDF("s")
      .withColumn("fp", Fnv64.fnv64(col("s")))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vectors.foreach { case (in, want) => assert(got(in) == want, s"input '$in'") }
  }

  test("Fnv64 is null-safe and distinct on distinct inputs") {
    import spark.implicits._
    val df = Seq(Some("x"), None, Some("y")).toDF("s")
      .withColumn("fp", Fnv64.fnv64(col("s")))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(1)) == 1)
    val vals = rows.filterNot(_.isNullAt(1)).map(_.getLong(1))
    assert(vals.distinct.length == 2)
  }
}

package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  private lazy val base = Tables.load(spark, sf, "customer")
    .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  test("upsert: matched keys take change values, unmatched insert, rest carry forward") {
    import spark.implicits._
    val changes = Seq(
      (1L, "updated-name", 999.99),       // matched → overwrite
      (9000001L, "brand-new", 0.0)        // unmatched → insert
    ).toDF("c_custkey", "c_name", "c_acctbal")
    val merged = Merge.upsert(base, changes, Seq("c_custkey"))
    assert(merged.count() == base.count() + 1, "one inserted row")
    val r1 = merged.filter(col("c_custkey") === 1L).head
    assert(r1.getString(1) == "updated-name" && r1.getDouble(2) == 999.99)
    assert(merged.filter(col("c_custkey") === 9000001L).count() == 1)
    // an untouched key keeps its base row exactly
    val untouched = merged.filter(col("c_custkey") === 2L)
    val orig = base.filter(col("c_custkey") === 2L)
    assert(untouched.exceptAll(orig).isEmpty)
  }

  test("upsert: null change columns fall back to base values (partial update)") {
    import spark.implicits._
    val changes = Seq((1L, Option.empty[String], Option(555.55)))
      .toDF("c_custkey", "c_name", "c_acctbal")
    val merged = Merge.upsert(base, changes, Seq("c_custkey"))
    val r = merged.filter(col("c_custkey") === 1L).head
    val origName = base.filter(col("c_custkey") === 1L).head.getString(1)
    assert(r.getString(1) == origName, "null change column keeps the base value")
    assert(r.getDouble(2) == 555.55)
  }

  test("upsert rejects duplicate change keys (MERGE multiple-match semantics)") {
    import spark.implicits._
    val changes = Seq(
      (1L, "first", 1.0),
      (1L, "second", 2.0) // same key twice — would fan the join out
    ).toDF("c_custkey", "c_name", "c_acctbal")
    val err = intercept[IllegalArgumentException] {
      Merge.upsert(base, changes, Seq("c_custkey"))
    }
    assert(err.getMessage.contains("duplicate keys"))
  }

  test("upsert rejects mismatched schemas at plan time") {
    import spark.implicits._
    val bad = Seq((1L, "x")).toDF("c_custkey", "c_name")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, bad, Seq("c_custkey"))
    }
  }
}

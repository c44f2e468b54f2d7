package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout optimization: Z-order (Morton) interleaving of two key
  * columns, the multi-dimensional clustering technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY` — range-partitioning and sorting by
  * the interleaved value co-locates rows that are close in BOTH
  * dimensions, so min/max file statistics prune scans for predicates on
  * EITHER key. A single-column sort gives perfect pruning on one key and
  * none on the other; Z-order trades a little of the first for a lot of
  * the second.
  *
  * Pure integer bit-math (the classic parallel-prefix bit spread), fully
  * replayable in SQL — no UDF, stays inside whole-stage codegen.
  */
object Layout {

  /** Spread the low 16 bits of `v` to even bit positions (Morton spread):
    * 0000abcd → 0a0b0c0d pattern, via the standard mask ladder. */
  def spread16(v: Column): Column = {
    val m0 = lit(0x00FF00FFL)
    val m1 = lit(0x0F0F0F0FL)
    val m2 = lit(0x33333333L)
    val m3 = lit(0x55555555L)
    val s0 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(m0)
    val s1 = (s0.bitwiseOR(shiftleft(s0, 4))).bitwiseAND(m1)
    val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(m2)
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(m3)
  }

  /** 32-bit Z-value interleaving the low 16 bits of x and y (x in even
    * bits, y in odd). Inputs must already be in [0, 65536). */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Cluster `df` for two-dimensional locality: range-partition and sort
    * by the Z-value of (xCol % 2^16, yCol % 2^16) into `nPartitions`
    * write tasks. Each output file then covers a tight rectangle in
    * (x, y) space — its min/max column stats prune on either key. */
  def zOrderBy(df: DataFrame, xCol: String, yCol: String,
      nPartitions: Int): DataFrame = {
    val z = zValue(pmod(col(xCol), lit(65536L)), pmod(col(yCol), lit(65536L)))
    df.withColumn("__z", z)
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}

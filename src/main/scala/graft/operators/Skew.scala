package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overwhelm single tasks.
  *
  * AQE (enabled in every session builder here) already splits skewed
  * partitions of sort-merge joins at runtime; explicit salting remains the
  * tool when (a) the skew is extreme enough that even one key exceeds a
  * task's memory, or (b) the join is a shuffled hash join AQE won't rewrite.
  *
  * `saltedJoin` replicates the SMALL side `nSalts`× and scatters the large
  * side's hot keys across `nSalts` tasks: shuffle volume grows by
  * |small|·(nSalts−1), task skew shrinks by nSalts.
  */
object Skew {

  /** Join `large ⋈ small` on `largeKey == smallKey` with the large side
    * salted. Result is identical to the plain join (salts only split work).
    * Supports inner and left_outer (right/full would need the salt on the
    * other side). */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      nSalts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    // any assignment works for correctness; spread rows round-robin-ish
    val l = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    l.join(s, l(largeKey) === s(smallKey) && l("__salt") === s("__salt"), joinType)
      .drop("__salt")
  }
}

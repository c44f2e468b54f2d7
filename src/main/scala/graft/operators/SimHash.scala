package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** 64-bit SimHash via a typed [[Aggregator]]: each token hash votes ±1 on
  * every bit position; the signature takes the sign of each counter.
  * The Aggregator form gives a mergeable buffer (partial aggregation
  * map-side, merge reduce-side) — the right shape for a 100 TB corpus.
  */
object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
    var b = 0
    while (b < 64) {
      if (((tokenHash >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
      b += 1
    }
    buf
  }

  override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 64) { x(b) += y(b); b += 1 }
    x
  }

  override def finish(buf: Array[Int]): Long = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimHash {
  /** (id, sig) per document: distinct token hashes (native one-pass
    * expression, no token strings materialized) → bit votes. */
  def signatures(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(graft.functions.ShingleHashes.tokenHashes(col("text"))).as("h"))
      .groupBy(col("id"))
      .agg(udaf(SimHashAgg, Encoders.scalaLong).apply(col("h")).as("sig"))
}

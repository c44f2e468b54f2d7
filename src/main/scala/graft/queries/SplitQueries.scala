package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-expressible views of the split engine's two core dataflow semantics
  * (SURVEY.md §2 O5 + O10/O13), run over the testdata tables so the DuckDB
  * oracle can check them: the split manifest (group-by-key row/partition
  * counts) and the marker-ledger anti-join (dates present minus dates done).
  */
object SplitQueries {

  /** O10+O13 as a query: the per-key manifest a split of `events` by
    * `user_id` would produce — row count and distinct date count per key. */
  def q50SplitManifest(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("user_id").as("split_key"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("ts").cast("date")).as("n_dates"))
      .orderBy(col("split_key"))

  /** O5 as a query: set-difference of date sets (ship dates with no order
    * date), the ledger's input−done anti-join at data scale. */
  def q51LedgerAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val shipped = Tables.load(s, dir, "lineitem")
      .select(col("l_shipdate").cast("date").as("d")).distinct()
    val ordered = Tables.load(s, dir, "orders")
      .select(col("o_orderdate").cast("date").as("d")).distinct()
    shipped.except(ordered).orderBy(col("d"))
  }
}

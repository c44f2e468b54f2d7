package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers. The reference engine reads and writes exactly one
  * format (parquet on S3, SURVEY.md §2.1); this module generalizes the scan
  * and sink surface to the formats Spark ships (parquet/csv/json/orc) with
  * the scale-relevant knobs made explicit.
  *
  * Everything routes through the Hadoop FileSystem API path handling, so
  * `file://` in tests and `s3a://` on a cluster are the same code.
  */
object IO {

  /** Read with optional enforced schema (schema-on-read like the reference
    * when `schema` is None; fail-fast contract when enforced). */
  def read(spark: SparkSession, path: String, format: String = "parquet",
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(defaultsFor(format) ++ options)
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  /** Write with the knobs that matter at scale: `partitionBy` for
    * partition-pruned layouts, `maxRecordsPerFile` to bound file size under
    * skew, `coalesceTo` for small-output compaction. */
  def write(df: DataFrame, path: String, format: String = "parquet",
      mode: String = "overwrite", partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L, coalesceTo: Int = 0,
      options: Map[String, String] = Map.empty): Unit = {
    val src = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    var w = src.write.format(format).mode(mode)
      .options(defaultsFor(format) ++ options)
    if (maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(path)
  }

  /** Format defaults chosen for lossless roundtrips (header'd CSV with
    * explicit timestamp format; JSON is lossless for our types already). */
  private def defaultsFor(format: String): Map[String, String] = format match {
    case "csv" => Map("header" -> "true",
      // Spark's CSV writer trims edge whitespace by default — disable both
      // so string columns with leading/trailing spaces round-trip losslessly
      "ignoreLeadingWhiteSpace" -> "false",
      "ignoreTrailingWhiteSpace" -> "false",
      "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS[XXX]")
    case _ => Map.empty
  }
}

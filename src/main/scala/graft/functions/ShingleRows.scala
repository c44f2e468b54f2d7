package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (the Generator / UDTF extension
  * surface, completing the triad next to scalar expressions and
  * TypedImperativeAggregate): one input document row → one output row per
  * POSITIONED word n-gram, `(pos, shingle)`. The row-per-shingle shape
  * that position-aware operators (winnowing, q67) consume — produced
  * directly by the generator instead of a split → sequence-explode →
  * element_at chain, so the plan is one GenerateExec over the scan with no
  * intermediate token array column.
  *
  * Tokenization contract: the explicit RE2-compatible whitespace class
  * [[TextFunctions.WsRun]] (Java's \s also matches \x0B; RE2 — the
  * DuckDB oracle's engine — does not), so SQL oracles replaying
  * `string_split_regex(trim(text), '\s+')` agree token-for-token on
  * every byte. Docs with fewer than `n` tokens emit nothing.
  */
case class ShingleRows(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "shingle_rows needs n >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_rows requires string, got ${other.simpleString(10)}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val s = v.asInstanceOf[UTF8String].toString.trim
    val toks = s.split(TextFunctions.WsRun)
    if (toks.length < n) return Nil
    (0 to toks.length - n).map { i =>
      InternalRow(i, UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleRows =
    copy(child = c)
}

object ShingleRows {
  /** Column API: select with a two-name alias, e.g.
    * `df.select(col("id"), shingleRows(col("text"), 3).as(Seq("pos", "s3")))`. */
  def shingleRows(text: Column, n: Int = 3): Column =
    Bridge.column(ShingleRows(Bridge.expression(text), n))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native CHARACTER n-gram generator (the char-level sibling of
  * [[ShingleRows]]): one input row → one output row per sliding character
  * n-gram of `lower(trim(text))`. Replaces the
  * `transform(sequence(1, length-n+1), i -> substring(t, i, n))` HOF
  * chain, which is CodegenFallback AND materializes a length-sized array
  * per row before exploding — per-row allocation the generator never
  * does (it walks the string once, emitting rows).
  *
  * Semantics contract (oracle-replayable): grams are formed over CODE
  * POINTS of the lowercased trimmed string — exactly what Spark
  * `substring(t, i, n)`/`length()` and DuckDB `substr()`/`length()`
  * count, so a surrogate pair is ONE gram position (see the eval body;
  * java String.substring semantics would split pairs and diverge).
  * Strings shorter than `n` code points emit nothing.
  */
case class CharNgramRows(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "char_ngram_rows needs n >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_rows requires string, got ${other.simpleString(10)}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    // UTF8String.trim/toLowerCase are the exact kernels behind Spark's
    // trim()/lower() expressions — NOT java.lang.String.trim (which strips
    // all control chars, not just spaces) or locale-sensitive toLowerCase
    val s = v.asInstanceOf[UTF8String].trim().toLowerCase().toString
    // Slice by CODE POINTS, not UTF-16 code units: Spark substring()/
    // length() and DuckDB substr()/length() both count code points, so a
    // non-BMP character (surrogate pair) must be one gram position —
    // java String.substring(i, i+n) would split surrogate pairs and
    // diverge from the HOF formulation and the oracle on any emoji/CJK-ext
    // text. One pass precomputes the code-point start offsets.
    val cp = s.codePointCount(0, s.length)
    if (cp < n) return Nil
    val off = new Array[Int](cp + 1)
    var u = 0
    var j = 0
    while (j < cp) { off(j) = u; u = s.offsetByCodePoints(u, 1); j += 1 }
    off(cp) = s.length
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i <= cp - n
      override def next(): InternalRow = {
        val r = InternalRow(UTF8String.fromString(s.substring(off(i), off(i + n))))
        i += 1
        r
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): CharNgramRows =
    copy(child = c)
}

object CharNgramRows {
  /** Column API: `df.select(col("id"), charNgramRows(col("text"), 3).as("tri"))`.
    * The generator lowercases and trims internally — pass the raw column. */
  def charNgramRows(text: Column, n: Int = 3): Column =
    Bridge.column(CharNgramRows(Bridge.expression(text), n))
}

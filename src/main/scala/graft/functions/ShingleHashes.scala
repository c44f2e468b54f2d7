package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of a document's word n-gram shingles, computed in
  * one pass over the raw UTF-8 bytes — no token/ngram string allocation, no
  * higher-order functions (Spark's transform/zip_with are CodegenFallback).
  *
  * Set semantics: the result is a bijection of the document's distinct
  * space-joined n-gram strings (modulo 64-bit collisions, ~n²/2⁶⁵), so
  * Jaccard over these hash sets equals Jaccard over the string shingle sets —
  * which is what the DuckDB oracle computes.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any =
    ArrayData.toArrayData(
      ShingleHashes.distinctShingleHashes(v.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.ShingleHashes.distinctShingleHashes($c, $n));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

object ShingleHashes {

  /** FNV-1a over a byte range. */
  private def fnvRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = Fnv64.OffsetBasis
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xffL)) * Fnv64.Prime
      i += 1
    }
    h
  }

  /** Combine token hashes into an order-sensitive shingle hash (FNV over the
    * 8 bytes of each token hash, with a separator step so ("ab","c") and
    * ("a","bc") cannot collide structurally). */
  private def combine(tokenHashes: Array[Long], from: Int, n: Int): Long = {
    var h = Fnv64.OffsetBasis
    var k = from
    while (k < from + n) {
      val t = tokenHashes(k)
      var s = 0
      while (s < 8) {
        h = (h ^ ((t >>> (s * 8)) & 0xffL)) * Fnv64.Prime
        s += 1
      }
      h = (h ^ 0x20L) * Fnv64.Prime // separator byte
      k += 1
    }
    h
  }

  /** Distinct hashes of all word n-grams of `text` (whitespace-tokenized). */
  def distinctShingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    // 1. token hashes in one byte scan
    var tokens = new Array[Long](16)
    var nTokens = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(bytes(i))) i += 1
        if (nTokens == tokens.length) {
          tokens = java.util.Arrays.copyOf(tokens, tokens.length * 2)
        }
        tokens(nTokens) = fnvRange(bytes, start, i)
        nTokens += 1
      }
    }
    if (nTokens < n) return Array.emptyLongArray
    // 2. shingle hashes, deduplicated
    val seen = new java.util.HashSet[java.lang.Long](nTokens * 2)
    val out = new Array[Long](nTokens - n + 1)
    var nOut = 0
    var w = 0
    while (w <= nTokens - n) {
      val h = combine(tokens, w, n)
      if (seen.add(h)) { out(nOut) = h; nOut += 1 }
      w += 1
    }
    if (nOut == out.length) out else java.util.Arrays.copyOf(out, nOut)
  }

  // RE2 \s = [\t\n\f\r ] — deliberately EXCLUDES vertical tab (0x0b), unlike
  // Java's \s. The DuckDB oracle tokenizes with RE2, so the engine-side
  // tokenizer must agree byte-for-byte (TextFunctions uses the same class).
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  /** Column API: distinct 64-bit word-n-gram shingle hashes. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))

  /** Distinct token hashes (n=1 shingles). */
  def tokenHashes(text: Column): Column = shingleHashes(text, 1)
}

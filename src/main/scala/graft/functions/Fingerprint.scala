package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a rolling fingerprint over a string's UTF-8 bytes — a native
  * Catalyst expression with whole-stage codegen (no UDF boxing; stays inside
  * the generated loop at scale). Used for content fingerprinting /
  * cheap exact-dup keys in the text pipeline.
  *
  * Reference mapping: the reference engine has no fingerprint operator
  * (SURVEY.md §2.1 "UDF surface: ABSENT"); this belongs to the north-star
  * text-analysis extension set.
  */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv64 requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any =
    Fnv64.hash(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Fnv64.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {
  final val OffsetBasis = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** FNV-1a over raw bytes (public domain algorithm, Fowler–Noll–Vo). */
  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }

  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: 64-bit FNV-1a fingerprint of a string column. */
  def fnv64(c: Column): Column =
    Bridge.column(Fnv64(Bridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector math over `array<float>` embedding columns.
  *
  * Spark's higher-order functions (zip_with/aggregate) are CodegenFallback —
  * every element round-trips through interpreted expression eval. On a
  * 100 TB embedding corpus that is the hot loop, so these are real Catalyst
  * expressions emitting a tight primitive `double` loop in whole-stage
  * codegen.
  *
  * Arithmetic contract (oracle parity): each float is widened to double
  * BEFORE multiplication and accumulation runs in index order — identical
  * to both the HOF formulation it replaces and the DuckDB oracle SQL.
  */
object VectorExpressions {

  private def checkFloatArray(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float>, got ${other.simpleString(10)}")
  }

  /** Σ aᵢ·bᵢ in double precision. Null if either side is null; errors are
    * not possible (length mismatch sums over the shorter prefix, matching
    * zip_with's null-padding only when lengths are equal — callers use
    * fixed-dimension embeddings). */
  case class DotF(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(checkFloatArray(left.dataType, "dot_f"),
          checkFloatArray(right.dataType, "dot_f"))
        .find(_.isFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF =
      copy(left = l, right = r)
  }

  /** √(Σ aᵢ²) in double precision. */
  case class NormF(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkFloatArray(child.dataType, "norm_f")

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |double $acc = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = (double) $a.getFloat($i);
           |  $acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): NormF = copy(child = c)
  }

  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotF(Bridge.expression(a), Bridge.expression(b)))

  def normF(a: Column): Column =
    Bridge.column(NormF(Bridge.expression(a)))
}

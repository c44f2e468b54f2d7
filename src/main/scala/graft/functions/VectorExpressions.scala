package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}

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

  /** Comma-joined symmetric int8 quantization: round(127·xᵢ/norm) per
    * component, one output string. Replaces the `transform()` HOF
    * formulation (CodegenFallback, per-element interpreted eval) with a
    * single codegen'd call; rounding is BigDecimal HALF_UP — bit-identical
    * to Spark's `round(col, 0)` on doubles, which the DuckDB oracle
    * replays. */
  case class Quant8F(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = StringType
    // degenerate vectors (norm 0 / non-finite quotient) quantize to null —
    // same degradation the transform() HOF formulation had — so the
    // expression is nullable even over non-null inputs
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkFloatArray(left.dataType, "quant8_f") match {
        case TypeCheckResult.TypeCheckSuccess if right.dataType != DoubleType =>
          TypeCheckResult.TypeCheckFailure(
            s"quant8_f norm must be double, got ${right.dataType.simpleString}")
        case r => r
      }

    override def nullSafeEval(a: Any, b: Any): Any =
      VectorQuant.quantize(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""${ev.value} = graft.functions.VectorQuant.quantize($a, $b);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin)

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Quant8F =
      copy(left = l, right = r)
  }

  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotF(Bridge.expression(a), Bridge.expression(b)))

  def normF(a: Column): Column =
    Bridge.column(NormF(Bridge.expression(a)))

  def quant8F(vec: Column, norm: Column): Column =
    Bridge.column(Quant8F(Bridge.expression(vec), Bridge.expression(norm)))
}

/** Static helper shared by Quant8F's interpreted eval and generated code
  * (top-level object → Java static forwarder, callable from codegen). */
object VectorQuant {
  /** Returns null for degenerate inputs (norm 0 or non-finite, or a
    * non-finite component quotient): BigDecimal.valueOf(NaN) would throw
    * and fail the whole job at runtime, and an all-zero embedding has no
    * meaningful int8 quantization — null is the "can't quantize" signal. */
  def quantize(arr: ArrayData, norm: Double): org.apache.spark.unsafe.types.UTF8String = {
    if (norm == 0.0 || java.lang.Double.isNaN(norm) || java.lang.Double.isInfinite(norm))
      return null
    val sb = new java.lang.StringBuilder
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      val q = arr.getFloat(i).toDouble * 127.0 / norm
      if (java.lang.Double.isNaN(q) || java.lang.Double.isInfinite(q)) return null
      sb.append(java.math.BigDecimal
        .valueOf(q)
        .setScale(0, java.math.RoundingMode.HALF_UP).intValue())
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
}

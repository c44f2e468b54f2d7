package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Per-row evaluation of the FROZEN quantizer models (IVF centroids, PQ
  * codebook) as native expressions over `array<float>` / `array<double>`
  * embedding columns.
  *
  * WHY (optimization guide §2.4 — remove shuffles outright): encoding a
  * batch against a frozen model was a 4-exchange plan per append —
  * posexplode to (id, dim, x) rows, broadcast-join the model on `dim`,
  * hash-aggregate (id, [m,] cid) sums, hash-aggregate the argmin, then
  * join the winners back to the vectors. The model is k·D doubles
  * (bounded driver metadata, the probed-cell-collect precedent), so the
  * whole computation is a pure per-row function of (vector, model): one
  * scan-local projection, ZERO exchanges, and the vectors never leave
  * the scan until the store write itself.
  *
  * ARITHMETIC CONTRACT (oracle parity — the repo-wide determinism rules):
  * per-dimension term = round((x−c)², 12) exactly as Spark's `round`
  * (BigDecimal.valueOf(t).setScale(12, HALF_UP).doubleValue) followed by
  * the double→decimal(28,12) cast (BigDecimal.valueOf(rounded).setScale
  * (12, HALF_UP)); terms are summed as exact BigDecimals (decimal
  * addition is associative, so any order equals the old aggregate's
  * partial-merge order); argmin ties break on the smaller cid (ascending
  * iteration with strict <, bit-equal to `min(struct(d2, cid))`). The
  * result d2 is Decimal(38,12) — the exact type `sum(decimal(28,12))`
  * produced. A vector contributing NO terms for any cell (null/empty
  * array) yields NULL, matching the old plan where posexplode emitted no
  * rows for it.
  *
  * These are CodegenFallback expressions — unlike a zip_with/aggregate
  * HOF chain (one interpreted lambda round-trip per ELEMENT), the
  * fallback costs one virtual call per ROW and the k·D loop inside runs
  * as plain JVM bytecode; the per-row cost is the BigDecimal math itself,
  * which the exactness contract requires in any formulation. */
object ModelExpressions {

  /** Driver-collected frozen model: centroid ids ascending, each with its
    * (dim, component) pairs sorted by dim. Bounded at k·D doubles. */
  final case class VectorModel(cids: Array[Int], dims: Array[Array[Int]],
      cs: Array[Array[Double]]) extends Serializable

  /** Collect a (cid, dim, c) model table/plan into a [[VectorModel]] —
    * one bounded driver action (k·D rows, the model-sized-metadata
    * budget of the probed-cell collect). */
  def collectModel(centroids: org.apache.spark.sql.DataFrame): VectorModel = {
    import org.apache.spark.sql.functions.col
    val rows = centroids.select(col("cid").cast("int"),
        col("dim").cast("int"), col("c").cast("double"))
      .collect()
    val byCid = rows.groupBy(_.getInt(0)).toArray.sortBy(_._1)
    VectorModel(
      byCid.map(_._1),
      byCid.map(_._2.map(_.getInt(1)).sorted),
      byCid.map { case (_, rs) =>
        rs.map(r => (r.getInt(1), r.getDouble(2))).sortBy(_._1).map(_._2)
      })
  }

  private def checkVecArray(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> or array<double>, got " +
          other.simpleString(10))
    }

  private def elemAt(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** round((x−c)², 12) then cast to decimal scale 12 — Spark's exact
    * `cast(round(t, 12) as decimal(28,12))` double round-trip. */
  private def term(x: Double, c: Double): JBigDecimal = {
    val diff = x - c
    val rounded = JBigDecimal.valueOf(diff * diff)
      .setScale(12, RoundingMode.HALF_UP).doubleValue()
    JBigDecimal.valueOf(rounded).setScale(12, RoundingMode.HALF_UP)
  }

  /** struct(cid int, d2 decimal(38,12)) of the nearest model centroid —
    * exact decimal-summed squared L2, ties to the smaller cid; null when
    * the vector contributes no terms (null/empty array). */
  case class CellAssignF(child: Expression, model: VectorModel)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("d2", DecimalType(38, 12), nullable = false)))
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArray(child.dataType, "cell_assign_f")
    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var bestJ = -1
      var bestD2: JBigDecimal = null
      var j = 0
      while (j < model.cids.length) {
        val ds = model.dims(j); val cs = model.cs(j)
        var acc: JBigDecimal = null
        var i = 0
        while (i < ds.length) {
          val d = ds(i)
          if (d < n && !arr.isNullAt(d)) {
            val t = term(elemAt(arr, d, isFloat), cs(i))
            acc = if (acc == null) t else acc.add(t)
          }
          i += 1
        }
        if (acc != null && (bestD2 == null || acc.compareTo(bestD2) < 0)) {
          bestD2 = acc; bestJ = j
        }
        j += 1
      }
      if (bestJ < 0) null
      else new GenericInternalRow(Array[Any](model.cids(bestJ),
        org.apache.spark.sql.types.Decimal(bestD2, 38, 12)))
    }

    override protected def withNewChildInternal(c: Expression): CellAssignF =
      copy(child = c)
  }

  /** array<struct<m int, code int>> of the vector's PQ codes against the
    * frozen codebook: per subspace m (dim ÷ subDim), the cid minimizing
    * the exact decimal-summed subdistance, ties to the smaller cid. Null
    * for a null vector; subspaces with no contributing terms for any cid
    * are absent from the array (the old inner-join semantics). */
  case class PqCodesF(child: Expression, model: VectorModel, subDim: Int)
      extends UnaryExpression with CodegenFallback {
    require(subDim >= 1, "subDim must be >= 1")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("m", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArray(child.dataType, "pq_codes_f")
    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    // per cid, its (dim, c) pairs grouped by subspace m — precomputed so
    // eval scans each centroid component exactly once per subspace
    private lazy val byM: Array[Array[Array[(Int, Double)]]] =
      model.cids.indices.toArray.map { j =>
        val grouped = model.dims(j).zip(model.cs(j)).groupBy(_._1 / subDim)
        val mMax = if (grouped.isEmpty) -1 else grouped.keys.max
        (0 to mMax).toArray.map(m =>
          grouped.getOrElse(m, Array.empty[(Int, Double)]))
      }

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      val mMax = (n - 1) / subDim
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var m = 0
      while (m <= mMax) {
        var bestJ = -1
        var bestD2: JBigDecimal = null
        var j = 0
        while (j < model.cids.length) {
          val slices = byM(j)
          var acc: JBigDecimal = null
          if (m < slices.length) {
            val pairs = slices(m)
            var i = 0
            while (i < pairs.length) {
              val d = pairs(i)._1
              if (d < n && !arr.isNullAt(d)) {
                val t = term(elemAt(arr, d, isFloat), pairs(i)._2)
                acc = if (acc == null) t else acc.add(t)
              }
              i += 1
            }
          }
          if (acc != null && (bestD2 == null || acc.compareTo(bestD2) < 0)) {
            bestD2 = acc; bestJ = j
          }
          j += 1
        }
        if (bestJ >= 0)
          out += new GenericInternalRow(Array[Any](m, model.cids(bestJ)))
        m += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): PqCodesF =
      copy(child = c)
  }

  /** array<int> of LSH band hashes — bit j of band b is the sign of the
    * vector's dot product with hyperplane b·r+j, bandHash = Σ bitⱼ·2ʲ.
    *
    * WHY: the per-plane formulation built nPlanes typedlit arrays (each
    * maxDim floats) joined by nPlanes DotF + when + add nodes — a
    * >25,000-node expression tree per projection at 128 planes × two
    * levels, re-analyzed by Catalyst on EVERY append/serve plan (measured:
    * q179's per-run driver gap was ~6 s, stable across reps — analysis
    * cost, not codegen compile). One native node carrying the plane
    * matrix as a reference shrinks the tree to a single expression and
    * runs the p·d loop as plain JVM bytecode.
    *
    * ARITHMETIC: identical to the literal form — each dot accumulates
    * vec[i].toDouble · plane[i].toDouble in index order over
    * min(|vec|, maxDim) elements; bit p is acc > 0 — so band hashes (and
    * every oracle-gated banded query) are bit-equal. */
  case class BandHashesF(child: Expression, planes: Array[Array[Float]],
      r: Int) extends UnaryExpression with CodegenFallback {
    require(r >= 1, "r must be >= 1")
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkVecArray(child.dataType, "band_hashes_f")
    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val nBands = planes.length / r
      val out = new Array[Any](nBands)
      var b = 0
      while (b < nBands) {
        var hash = 0
        var j = 0
        while (j < r) {
          val plane = planes(b * r + j)
          val n = math.min(arr.numElements(), plane.length)
          // no per-element null check — bit-parity with DotF, which reads
          // the raw float slots (these corpora carry no null elements)
          var acc = 0.0
          var i = 0
          while (i < n) {
            acc += elemAt(arr, i, isFloat) * plane(i).toDouble
            i += 1
          }
          if (acc > 0) hash += 1 << j
          j += 1
        }
        out(b) = hash
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): BandHashesF =
      copy(child = c)
  }

  def cellAssignF(vec: Column, model: VectorModel): Column =
    Bridge.column(CellAssignF(Bridge.expression(vec), model))

  def pqCodesF(vec: Column, model: VectorModel, subDim: Int): Column =
    Bridge.column(PqCodesF(Bridge.expression(vec), model, subDim))

  def bandHashesF(vec: Column, planes: Array[Array[Float]], r: Int): Column =
    Bridge.column(BandHashesF(Bridge.expression(vec), planes, r))
}

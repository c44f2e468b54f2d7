package graft.plans

import graft.functions.{Fnv64, ShingleHashes}
import graft.functions.VectorExpressions.{DotF, NormF}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SQL registration of the engine's native expressions, so
  * `spark.sql("SELECT fnv64(text) …")` works next to the Column API.
  *
  * Two activation paths:
  *  - session build time: `.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.plans.GraftExtensions`;
  *  - an already-running session: `GraftFunctions.install(spark)`.
  *
  * No custom planner strategies are needed for reference parity
  * (SURVEY.md §4); injectPlannerStrategy is where a whole-operator
  * physical node would slot in.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fnv64"),
      info("fnv64", "fnv64(str) - 64-bit FNV-1a fingerprint"),
      (args: Seq[Expression]) => Fnv64(args.head)),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(str[, n]) - distinct word-ngram hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => ShingleHashes(c, 3)
        case Seq(c, Literal(n: Int, _)) => ShingleHashes(c, n)
        case _ => throw new IllegalArgumentException(
          "shingle_hashes(text[, n:int literal])")
      }),
    (FunctionIdentifier("dot_f"),
      info("dot_f", "dot_f(array<float>, array<float>) - double dot product"),
      (args: Seq[Expression]) => DotF(args(0), args(1))),
    (FunctionIdentifier("norm_f"),
      info("norm_f", "norm_f(array<float>) - double L2 norm"),
      (args: Seq[Expression]) => NormF(args.head)),
    (FunctionIdentifier("shingle_rows"),
      info("shingle_rows", "shingle_rows(str[, n]) - UDTF: one (pos, shingle) row per positioned word n-gram"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => graft.functions.ShingleRows(c, 3)
        case Seq(c, Literal(n: Int, _)) => graft.functions.ShingleRows(c, n)
        case _ => throw new IllegalArgumentException(
          "shingle_rows(text[, n:int literal])")
      }),
    (FunctionIdentifier("quant8_f"),
      info("quant8_f", "quant8_f(array<float>, norm:double) - comma-joined int8 quantization"),
      (args: Seq[Expression]) =>
        graft.functions.VectorExpressions.Quant8F(args(0), args(1))),
    (FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct", "kmv_distinct(col[, k]) - KMV distinct-count sketch"),
      (args: Seq[Expression]) => (args match {
        case Seq(c) => graft.functions.KmvDistinct(c, 256)
        case Seq(c, Literal(k: Int, _)) => graft.functions.KmvDistinct(c, k)
        case _ => throw new IllegalArgumentException("kmv_distinct(col[, k:int literal])")
      }).toAggregateExpression()),
    (FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters", "heavy_hitters(str[, k]) - Space-Saving frequent-items map"),
      (args: Seq[Expression]) => (args match {
        case Seq(c) => graft.functions.HeavyHittersAgg(c, 64)
        case Seq(c, Literal(k: Int, _)) => graft.functions.HeavyHittersAgg(c, k)
        case _ => throw new IllegalArgumentException("heavy_hitters(col[, k:int literal])")
      }).toAggregateExpression()),
    (FunctionIdentifier("char_ngram_rows"),
      info("char_ngram_rows", "char_ngram_rows(str[, n]) - UDTF: one row per char n-gram of lower(trim(str))"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => graft.functions.CharNgramRows(c, 3)
        case Seq(c, Literal(n: Int, _)) => graft.functions.CharNgramRows(c, n)
        case _ => throw new IllegalArgumentException(
          "char_ngram_rows(text[, n:int literal])")
      }))

  /** Register into an already-built session. */
  def install(spark: SparkSession): Unit = all.foreach { case (id, inf, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
  }

  /** Add the custom planner strategies to a running session (idempotent). */
  def installPlanner(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
  }

}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // NOTE: no auto-rewrite of rank<=k filters into TopKPerKeyNode — Spark
    // >=3.5 already optimizes that pattern (InferWindowGroupLimit inserts
    // partial/final WindowGroupLimit); an extra rule would stack redundant
    // operators on top. TopK.perKey remains the explicit no-sort variant.
  }
}

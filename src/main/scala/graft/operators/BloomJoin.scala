package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter runtime pre-filtering for selective joins — the
  * shape Spark's own `InjectRuntimeFilter` applies when statistics allow,
  * made available on any DataFrame pair.
  *
  * Why it matters at 100 TB: a plain semi-join shuffles the ENTIRE probe
  * side on the join key even when only a sliver of it matches. Building a
  * compact bloom filter over the build side's keys (one distributed
  * aggregate; only the serialized filter — kilobytes to a few MB — returns
  * to the driver, same contract as any scalar subquery) lets the probe side
  * drop ~all non-matching rows AT THE SCAN, before its shuffle: the
  * exchange then carries |matches| + fpp·|probe| rows instead of |probe|.
  * The final exact semi-join removes the bloom's false positives, so the
  * output is EXACTLY the plain semi-join's.
  *
  * Uses Spark's public `DataFrameStatFunctions.bloomFilter` (build) and the
  * codegen'd catalyst `BloomFilterMightContain` (probe; same expression the
  * built-in runtime filter injects — it deserializes the filter once per
  * task, and the per-row test stays inside whole-stage codegen).
  */
object BloomJoin {

  /** `probe ⋉ build` with a bloom pre-filter on the probe side. Output is
    * bit-identical to `probe.join(build, keys, "left_semi")`.
    *
    * Cost model, stated plainly: the BUILD side is executed twice — once
    * for the bloom aggregate, once as the exact join's right side. That is
    * the winning trade exactly when build ≪ probe (the operator's use
    * case): two scans of the small side buy removing ~all of the LARGE
    * side's shuffle. If the build side is expensive to recompute, persist
    * it before calling (caller-owned lifecycle), or let AQE reuse the
    * exchange.
    *
    * @param expectedItems sizing for the bloom (≈ distinct build keys); at
    *   scale pass an `approx_count_distinct` estimate. ~1.2 bytes/key at
    *   fpp 0.03.
    */
  def semiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    // Hash agreement between build and probe is a CORRECTNESS precondition:
    // stat.bloomFilter hashes a long column with putLong, which is what the
    // probe-side BloomFilterMightContain (mightContainLong) replays — but a
    // string column is inserted as raw UTF8 bytes, which mightContainLong
    // can never match, yielding silent bloom false NEGATIVES the exact join
    // cannot recover. Integral keys use the native long path; any other
    // type is routed through xxhash64 on BOTH sides (hash collisions are
    // bloom false positives, removed by the exact semi-join). Differing
    // key types fail at plan time rather than corrupt results.
    import org.apache.spark.sql.types._
    def integral(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val pt = probe.schema(probeKey).dataType
    val bt = build.schema(buildKey).dataType
    val (buildCol, probeCol) =
      if (integral(pt) && integral(bt))
        (col(buildKey).cast("long"), col(probeKey).cast("long"))
      else {
        require(pt == bt,
          s"bloom semi-join keys must be both integral or the same type, " +
            s"got probe=${pt.simpleString} build=${bt.simpleString}")
        (xxhash64(col(buildKey)), xxhash64(col(probeKey)))
      }
    val bf = build.stat.bloomFilter(buildCol, expectedItems, fpp)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    // both sides hash raw longs (putLong / mightContainLong); probeCol is
    // the same long-valued expression the build side was inserted with
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      Bridge.expression(probeCol)))
    probe.filter(mightContain)
      .join(build, probe(probeKey) === build(buildKey), "left_semi")
  }
}

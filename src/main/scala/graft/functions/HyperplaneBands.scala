package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Banded random-hyperplane signatures for embedding LSH (SURVEY.md
  * §2.3/§2.4): one pass over the vector computes `bands` signatures of
  * `rowsPerBand` sign bits each — the cosine analogue of MinHash
  * banding. Two vectors collide in band t iff all of that band's
  * hyperplanes put them on the same side; banding ORs the bands, so
  * P(candidate) = 1-(1-(1-θ/π)^r)^b — tunable recall/pruning without
  * any all-pairs step.
  *
  * The arithmetic is deliberately EXACT-REPLAYABLE in any engine with
  * an md5() function, which is what lets the DuckDB oracle recompute
  * the banding keys bit for bit (upgrading the LSH gates from
  * rows-only to hash-match):
  *  - plane weights are integers in [-1000, 1000] derived from
  *    md5("hp:plane:coord") — no platform RNG, no broadcast matrix;
  *  - coordinates are quantized to floor(x · 2^20) (float→double is
  *    exact and ×2^20 only shifts the exponent, so the quantization
  *    itself has NO floating-point rounding);
  *  - the projection sign test runs on the integer sum Σ qx·w
  *    (|Σ| < 2^43 for dim ≤ 4096), which is order-independent —
  *    immune to the FP-summation-order divergence that a double dot
  *    product would have between engines.
  * The ~2^-20 relative quantization error perturbs each hyperplane
  * angle by < 10^-4 rad — far below the LSH family's own variance;
  * recall is measured in DedupSpec/SimilaritySpec either way.
  *
  * Compiled: the interpreted HOF formulation costs ~20 µs per 64-dim
  * row per plane — hundreds of planes would be minutes per million
  * rows; this runs the bands × rows × dim multiply loop as one static
  * call inside whole-stage codegen.
  */
case class HyperplaneBands(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression {

  require(rowsPerBand >= 1 && rowsPerBand <= 63, "rowsPerBand must fit a long signature")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bands requires array<float>/array<double>, got $dt")
    }

  override def nullSafeEval(a: Any): Any =
    HyperplaneBands.compute(a.asInstanceOf[ArrayData], bands, rowsPerBand, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.HyperplaneBands.compute($a, $bands, $rowsPerBand, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {
  import org.apache.spark.sql.GraftBridge

  def apply(c: Column, bands: Int, rowsPerBand: Int): Column =
    GraftBridge.column(HyperplaneBands(GraftBridge.expression(c), bands, rowsPerBand))

  /** floor(x · 2^20): the exact-replayable coordinate quantizer. */
  val QuantScale: Double = 1048576.0

  /** Deterministic integer weight of plane `p`, coordinate `j` in
    * [-1000, 1000]: unsigned md5_64("hp:p:j") mod 2001, shifted.
    * DuckDB replay: CAST(('0x'||substr(md5('hp:'||p||':'||j),1,16))
    * AS UBIGINT) % 2001 - 1000.
    */
  def weight(p: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"hp:$p:$j".getBytes("UTF-8"))
    val h = java.nio.ByteBuffer.wrap(d).getLong
    java.lang.Long.remainderUnsigned(h, 2001L) - 1000L
  }

  /** Weights depend only on (plane, coordinate) — constants across
    * every row — so derive the matrix once per (planes, dim) shape
    * instead of re-hashing planes × dim times per vector. The cache
    * is BOUNDED: a normal corpus has one embedding shape, but ragged/
    * corrupt dims are data-dependent, and an unbounded per-shape
    * cache would be executor-memory growth an adversarial input
    * controls — past the bound we fall back to uncached derivation.
    */
  private val MaxCachedShapes = 8
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  private def deriveWeights(planes: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(planes, dim)((p, j) => weight(p, j))

  private def weights(planes: Int, dim: Int): Array[Array[Long]] = {
    val key = (planes, dim)
    val cached = weightCache.get(key)
    if (cached != null) cached
    else if (weightCache.size < MaxCachedShapes)
      weightCache.computeIfAbsent(key, k => deriveWeights(k._1, k._2))
    else deriveWeights(planes, dim)
  }

  /** Called from both interpreted eval and generated code (one
    * implementation, still inside the codegen span).
    */
  def compute(v: ArrayData, bands: Int, rowsPerBand: Int, isFloat: Boolean): ArrayData = {
    val dim = v.numElements()
    val w = weights(bands * rowsPerBand, dim)
    // quantize once per vector, not once per plane
    val qx = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
      qx(j) = math.floor(x * QuantScale).toLong
      j += 1
    }
    val out = new Array[Long](bands)
    var t = 0
    while (t < bands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        val wp = w(t * rowsPerBand + r)
        var s = 0L
        var i = 0
        while (i < dim) {
          s += qx(i) * wp(i)
          i += 1
        }
        if (s > 0) sig |= (1L << r)
        r += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}

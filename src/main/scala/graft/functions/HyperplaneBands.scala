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
  * Plane weights are derived from splitmix64(plane, dim-index), so
  * every executor agrees on the planes without broadcasting a matrix
  * (same trick as Similarity.planeSig, but compiled: the interpreted
  * HOF formulation costs ~20 µs per 64-dim row per plane — hundreds of
  * planes would be minutes per million rows; this runs the
  * bands × rows × dim FMA loop as one static call inside whole-stage
  * codegen).
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

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random weight of plane `p`, coordinate `j`
    * in [-1, 1].
    */
  def weight(p: Int, j: Int): Double = {
    val h = splitmix64((p.toLong << 32) ^ j.toLong)
    ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** Weights depend only on (plane, coordinate) — constants across
    * every row — so derive the matrix once per (planes, dim) shape
    * instead of re-hashing planes × dim times per vector (that
    * re-derivation was ~half the hot-loop cost). The cache is
    * BOUNDED: a normal corpus has one embedding shape, but ragged/
    * corrupt dims are data-dependent, and an unbounded per-shape
    * cache would be executor-memory growth an adversarial input
    * controls — past the bound we fall back to uncached derivation.
    */
  private val MaxCachedShapes = 8
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def deriveWeights(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim)((p, j) => weight(p, j))

  private def weights(planes: Int, dim: Int): Array[Array[Double]] = {
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
    val out = new Array[Long](bands)
    var t = 0
    while (t < bands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        val wp = w(t * rowsPerBand + r)
        var s = 0.0
        var j = 0
        while (j < dim) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          s += x * wp(j)
          j += 1
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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column functions over Array[Float]/Array[Double] embeddings
  * (SURVEY.md §2.4/§2.6), backed by the codegen'd [[VecDot]]
  * expression (tight primitive loop inside whole-stage codegen).
  * Double accumulation in ascending index order — bit-identical to
  * the DuckDB oracle's `list_dot_product(CAST(.. AS DOUBLE[]))`.
  */
object VecFns {

  def dot(a: Column, b: Column): Column = VecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed-norm layout: pair-heavy operators
    * (near-dup self-joins, ANN scoring) attach `norm` once per vector
    * instead of recomputing it per pair.
    */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)
}

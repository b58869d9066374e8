package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column functions over Array[Float] embeddings (SURVEY.md
  * §2.4/§2.6) — `zip_with`/`aggregate` compositions, codegen-friendly,
  * computed in double with left-to-right summation so results are
  * bit-identical to the DuckDB oracle's double math.
  */
object VecFns {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

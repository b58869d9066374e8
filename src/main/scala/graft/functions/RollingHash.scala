package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Rabin–Karp rolling hash of a whole string (base 257 mod
  * 2^31−1) — replaces the `aggregate(transform(split(text,'')))`
  * composition, which runs an interpreted lambda per CHARACTER
  * (~n_chars × closure dispatch per row; the worst of the
  * interpreted-HOF hot paths).
  *
  * Semantics: one fold step per Unicode CODE POINT — exactly what the
  * DuckDB oracle's `list_reduce(ascii(split(text,'')))` computes
  * (measured: '😀' contributes 128512 in both engines). Note this is
  * deliberately NOT identical to the old HOF form on astral chars:
  * Spark's `split(c, "")` breaks a surrogate pair into two lone
  * surrogates that re-encode as '?', so the HOF hashed corrupted
  * input there and diverged from the oracle; the BMP range (where the
  * HOF is lossless) is property-tested equal.
  */
case class RollingHash(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftBridge

  def apply(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))

  private val Mod = 2147483647L // Mersenne 2^31-1: acc*257+cp stays in a long
  private val Base = 257L

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

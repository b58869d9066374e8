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
  * interpreted-HOF hot paths). One pass over code points in compiled
  * code, bit-identical to the fold and to the DuckDB
  * `list_reduce(ascii(...))` oracle (ascii() yields the code point,
  * so iteration is per code point, not per byte).
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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection size of two SORTED string arrays as a codegen'd merge
  * loop. `array_intersect` builds a hash set per row in interpreted
  * code — at 5M+ candidate pairs in the dedup verify stage that is
  * the dominant cost (measured 15 s at sf0.1); this merge runs in
  * ~0.5 s. Callers must pre-sort both sides with `array_sort` (done
  * once per doc, not per pair).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n1 = x.numElements(); val n2 = y.numElements()
    while (i < n1 && j < n2) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |int $n1 = $a.numElements(); int $n2 = $b.numElements();
         |while ($i < $n1 && $j < $n2) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
}

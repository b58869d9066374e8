package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams over a token array as one native loop (SURVEY.md
  * §2.3/§2.5). Replaces the transform(sequence)+element_at+concat_ws
  * higher-order composition, which interprets 3 lambda layers per
  * gram — measured ~10× slower on the sf0.1 corpus scan. Returns the
  * whole token sequence joined as a single "gram" when the doc is
  * shorter than n (parity with the DuckDB oracle's CASE).
  */
case class WordNgrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) {
      val all = new Array[UTF8String](m)
      var i = 0
      while (i < m) { all(i) = arr.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, all: _*)))
    } else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordNgrams {
  def apply(tokens: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(tokens), n))
}

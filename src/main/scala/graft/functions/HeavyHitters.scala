package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters (SURVEY.md §2.5): approximate top-k
  * frequent items in one pass with a fixed `capacity`-entry summary
  * per partition. Counts are underestimates with error ≤ n/capacity;
  * any item with true frequency > n/capacity is guaranteed present —
  * the way to build a 100 TB vocabulary without shuffling every
  * token (the exact groupBy shuffles the full token stream; this
  * shuffles `capacity` entries per partition).
  *
  * Merge folds summaries with the standard MG combine (add counts,
  * then decrement by the (capacity+1)-th largest). Output:
  * map<string, bigint> of surviving items → estimated counts.
  */
case class MisraGriesAgg(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  type Buf = scala.collection.mutable.HashMap[String, Long]

  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): Buf = scala.collection.mutable.HashMap.empty

  private def decrementAll(buf: Buf): Unit = {
    // shed the smallest count from every entry (classic MG decrement)
    val minOver = buf.valuesIterator.min
    val dead = scala.collection.mutable.ArrayBuffer.empty[String]
    buf.keysIterator.foreach { k =>
      val nv = buf(k) - minOver
      if (nv <= 0) dead += k else buf(k) = nv
    }
    dead.foreach(buf.remove)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None =>
          buf(s) = 1L
          if (buf.size > capacity) decrementAll(buf)
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { case (k, c) => b1(k) = b1.getOrElse(k, 0L) + c }
    while (b1.size > capacity) decrementAll(b1)
    b1
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.toSeq.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(t => UTF8String.fromString(t._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MisraGriesAgg {
  def heavyHitters(c: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(c), capacity).toAggregateExpression())
}

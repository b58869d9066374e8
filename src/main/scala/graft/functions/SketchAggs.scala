package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String


/** Native sketch aggregates (SURVEY.md §2.3).
  *
  * The composable formulation (transform(sequence(0,127)) + posexplode
  * + groupBy-min) materializes docs × tokens × perms rows — a 25M-row
  * shuffle at sf0.1 and catastrophic at 100 TB. These
  * TypedImperativeAggregates keep the whole signature in a fixed
  * Array[Long] buffer per group: the shuffle carries one 128-long
  * buffer per doc instead, and the hashing runs as a tight JVM loop.
  */
object SketchAggs {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of the MD5 digest, big-endian. SimHash AND MinHash
    * use this instead of murmur so the signature is reproducible in
    * ANY engine with an md5() function: the DuckDB oracle recomputes
    * token hashes, permutations, banding and verification bit for
    * bit, which is what upgrades the LSH gates from rows-only to
    * exact hash-match.
    */
  private[functions] def md5Hash64(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    java.nio.ByteBuffer.wrap(md.digest(bytes)).getLong
  }

  private def longsToBytes(a: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
    a.foreach(bb.putLong)
    bb.array()
  }

  private def bytesToLongs(b: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getLong)
  }

  /** MinHash signature: elementwise min over `perms` permutations of
    * each token's base hash. Uses the standard multiply-add
    * permutation family h_p(x) = (a_p·md5_64(x) + b_p) masked to
    * 63 bits — one md5 per token instead of `perms` hashes (≈100×
    * less hashing on a 100 TB token stream). Base hash and the
    * (a_p, b_p) constants all derive from md5, so any engine with an
    * md5() can replay the signature exactly (the DuckDB oracle does
    * the wrapping 64-bit multiply via 32-bit split in HUGEINT).
    * Output: array<bigint>.
    */
  case class MinHashAgg(
      child: Expression, perms: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

    override def children: Seq[Expression] = Seq(child)
    override def inputTypes = Seq(StringType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // deterministic odd multipliers / offsets per permutation,
    // md5-derived (a | 1 forces the multiplier odd = invertible mod 2^64)
    @transient private lazy val coefA: Array[Long] =
      Array.tabulate(perms)(p => md5Hash64(s"minhash:a:$p".getBytes("UTF-8")) | 1L)
    @transient private lazy val coefB: Array[Long] =
      Array.tabulate(perms)(p => md5Hash64(s"minhash:b:$p".getBytes("UTF-8")))

    override def createAggregationBuffer(): Array[Long] = Array.fill(perms)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val base = md5Hash64(v.asInstanceOf[UTF8String].getBytes)
        var p = 0
        while (p < perms) {
          val h = (coefA(p) * base + coefB(p)) & Long.MaxValue
          if (h < buf(p)) buf(p) = h
          p += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var p = 0
      while (p < perms) { if (b2(p) < b1(p)) b1(p) = b2(p); p += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(b: Array[Byte]): Array[Long] = bytesToLongs(b)

    override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
  }

  /** 64-bit SimHash: per (token, weight) input, each of the token
    * hash's 64 bits votes ±weight; the signature takes each bit's
    * vote sign. Buffer: 64 vote counters.
    */
  case class SimHashAgg(
      tok: Expression, weight: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

    override def children: Seq[Expression] = Seq(tok, weight)
    override def inputTypes = Seq(StringType, LongType)
    override def nullable: Boolean = false
    override def dataType: DataType = LongType

    override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val t = tok.eval(input)
      val w = weight.eval(input)
      if (t != null && w != null) {
        val h = md5Hash64(t.asInstanceOf[UTF8String].getBytes)
        val wv = w.asInstanceOf[Long]
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) buf(b) += wv else buf(b) -= wv
          b += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var b = 0
      while (b < 64) { b1(b) += b2(b); b += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = {
      var sig = 0L
      var b = 0
      while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }

    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(b: Array[Byte]): Array[Long] = bytesToLongs(b)

    override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(tok = c(0), weight = c(1))
  }

  /** Count-Min sketch: `depth` rows × `width` counters in one flat
    * fixed-size buffer per group — the mergeable frequency sketch for
    * token streams too wide for an exact groupBy (shuffle carries
    * depth×width longs per partition instead of the vocabulary).
    * Estimate for a token = min over rows of its bucket counter
    * (overestimates only, never under). Bucket row d of a token is the
    * first 4 md5 bytes of "token#d" mod width — pure md5 arithmetic,
    * so any engine replays bucketing AND the estimates exactly
    * (`text_countmin`'s DuckDB oracle recomputes the bucket sums in
    * SQL; collisions don't break the gate because the oracle takes the
    * same mins over the same collided sums).
    * Output: array<bigint> of length depth×width.
    */
  case class CountMinAgg(
      child: Expression, depth: Int, width: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

    override def children: Seq[Expression] = Seq(child)
    override def inputTypes = Seq(StringType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val tok = v.asInstanceOf[UTF8String].toString
        var d = 0
        while (d < depth) {
          // first 4 md5 bytes as unsigned — matches conv(substr(md5,1,8),16,10)
          val h32 = md5Hash64(s"$tok#$d".getBytes("UTF-8")) >>> 32
          buf(d * width + (h32 % width).toInt) += 1L
          d += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(b: Array[Byte]): Array[Long] = bytesToLongs(b)

    override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
  }

  /** Bloom filter over the string form of the key: an m-bit bitmap as
    * array<bigint> (m/64 words), mergeable by OR — the build side of
    * broadcast semi-join pruning. Positions use Kirsch–Mitzenmacher
    * double hashing over the two 60-bit halves of the key's md5, so
    * any engine with md5() replays the exact bit set (the DuckDB
    * oracle checks membership against the same position set):
    *   h1 = md5[0:15) hex, step = md5[16:31) hex % (m-1) + 1,
    *   pos_i = (h1 % m + i·step) % m,  i < k.
    * The shuffle carries one m/64-word buffer per partition, never
    * the keys.
    */
  case class BloomAgg(
      child: Expression, bits: Int, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

    require(bits % 64 == 0 && bits > 64, s"bits ($bits) must be a positive multiple of 64")
    require(k >= 1, s"k ($k) must be >= 1")

    override def children: Seq[Expression] = Seq(child)
    override def inputTypes = Seq(StringType)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): Array[Long] = new Array[Long](bits / 64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val md = md5Local.get(); md.reset()
        val d = java.nio.ByteBuffer.wrap(md.digest(v.asInstanceOf[UTF8String].getBytes))
        // top 60 bits of each 8-byte half = the value of the first /
        // second 15 hex chars, matching conv(substr(md5(x),...),16,10)
        val h1 = d.getLong(0) >>> 4
        val h2 = d.getLong(8) >>> 4
        val base = h1 % bits
        val step = h2 % (bits - 1) + 1
        var i = 0
        while (i < k) {
          val pos = ((base + i * step) % bits).toInt
          buf(pos >>> 6) |= 1L << (pos & 63)
          i += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var w = 0
      while (w < b1.length) { b1(w) |= b2(w); w += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(b: Array[Byte]): Array[Long] = bytesToLongs(b)

    override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
      copy(inputAggBufferOffset = offset)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
  }

  def bloom(key: Column, bits: Int, k: Int): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(key), bits, k).toAggregateExpression())

  def minhash(tok: Column, perms: Int): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(tok), perms).toAggregateExpression())

  def countmin(tok: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CountMinAgg(GraftBridge.expression(tok), depth, width).toAggregateExpression())

  def simhash(tok: Column, weight: Column): Column =
    GraftBridge.column(
      SimHashAgg(GraftBridge.expression(tok), GraftBridge.expression(weight))
        .toAggregateExpression())
}

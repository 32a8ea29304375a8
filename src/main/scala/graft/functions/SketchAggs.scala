package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom sketch aggregates.
  *
  * MinHash/SimHash signatures as N parallel `min(...)`/`sum(...)`
  * aggregate columns blow past codegen limits (128 independent
  * buffers, interpreted updates — 26 s at sf0.1). A
  * TypedImperativeAggregate keeps ONE primitive array buffer per
  * group and a tight while-loop per row: single-pass, merge-friendly
  * (map-side partial aggregation works), constant-size state — the
  * shape that scales to 100 TB shingle streams.
  */
object Sketches {
  @inline final def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** minhash_sketch(hash64): Array[Long] of `n` min-values, where
    * hash function i is splitmix64(x + i * GOLDEN). */
  def minhash(hash64: Column, n: Int): Column =
    GraftBridge.column(
      MinHashAgg(GraftBridge.expression(hash64), n)
        .toAggregateExpression())

  /** simhash64(hash64, weight): 64-bit SimHash of the weighted token
    * hash multiset per group. */
  def simhash(hash64: Column, weight: Column): Column =
    GraftBridge.column(
      SimHashAgg(GraftBridge.expression(hash64), GraftBridge.expression(weight))
        .toAggregateExpression())

  /** gramian(vec, d): one-pass moment aggregate over array<double>
    * vectors — emits [n, Σx (d entries), ΣxxT (d·d entries)] as one
    * flat array. Covariance (and so PCA) follows driver-side at
    * O(d²): the corpus is touched ONCE, the buffer is a constant
    * 1+d+d² doubles, and partial buffers merge by addition — the
    * mergeable-statistics shape that computes second moments at
    * 100 TB. */
  def gramian(vec: Column, d: Int): Column =
    GraftBridge.column(
      GramianAgg(GraftBridge.expression(vec), d).toAggregateExpression())

  private[functions] def longsToBytes(a: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(a.length * 8)
    a.foreach(bb.putLong)
    bb.array()
  }

  private[functions] def bytesToLongs(b: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getLong())
  }
}

/** One-pass MinHash signature aggregate over pre-hashed inputs. */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = Sketches.splitmix64(x + i * 0x9E3779B97F4A7C15L)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    Sketches.longsToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Sketches.bytesToLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashAgg = copy(child = c.head)
}

/** 64-bit SimHash over (tokenHash, weight) pairs; emits the signed-sum
  * sign bits as one long. */
case class SimHashAgg(
    hash: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hash, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    val w = weight.eval(input)
    if (h != null && w != null) {
      val x = h.asInstanceOf[Long]
      val c = w.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((x >>> j) & 1L) == 1L) buf(j) += c else buf(j) -= c
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] =
    Sketches.longsToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Sketches.bytesToLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimHashAgg =
    copy(hash = c(0), weight = c(1))
}

/** One-pass [n | Σx | ΣxxT] moment buffer over array<double> rows.
  * Emitted layout: buf(0)=n, buf(1..d)=sums, buf(1+d ..)=outer
  * products row-major (full matrix). Internally only the UPPER
  * triangle accumulates — ΣxxT is symmetric, so mirroring once at
  * eval() halves the multiply-adds on the one corpus-wide pass (the
  * hot loop: d²/2 vs d² per row). Skips null rows, wrong-length rows,
  * AND rows with a null element (a corrupt vector must not poison a
  * corpus-wide covariance). */
case class GramianAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gramian"

  // analysis-time type error instead of a mid-job buffer
  // reinterpretation (the function is SQL-exposed; an array<int> or
  // the natural array<float> mistake would otherwise read the unsafe
  // buffer at the wrong width and emit silently wrong moments)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gramian expects ARRAY<DOUBLE>, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](1 + d + d * d)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      // a null ELEMENT must also skip the row (not fold in as 0.0 with
      // n incremented) — same corrupt-vector invariant as null/wrong-
      // length rows
      if (arr.numElements() == d && !hasNullElement(arr)) {
        val x = arr.toDoubleArray()
        buf(0) += 1.0
        var i = 0
        while (i < d) {
          buf(1 + i) += x(i)
          val base = 1 + d + i * d
          val xi = x(i)
          var j = i
          while (j < d) { buf(base + j) += xi * x(j); j += 1 }
          i += 1
        }
      }
    }
    buf
  }

  private def hasNullElement(
      arr: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    var i = 0
    while (i < d) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    // mirror the accumulated upper triangle into the full row-major
    // matrix the callers consume; buf itself stays upper-only (eval
    // may run more than once on the same buffer)
    val out = buf.clone()
    var i = 1
    while (i < d) {
      var j = 0
      while (j < i) {
        out(1 + d + i * d + j) = buf(1 + d + j * d + i)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): GramianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): GramianAgg = copy(child = c.head)
}

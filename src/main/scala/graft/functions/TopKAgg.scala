package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate.
  *
  * The window-function form (`row_number() over (partition by k order
  * by v) <= n`) must shuffle and fully sort every row of every group.
  * This aggregate keeps a bounded k-element buffer per group, gets
  * map-side partial aggregation for free, and ships at most k rows
  * per group per partition through the shuffle — the difference
  * between sorting 100 TB and sorting k x |groups| rows.
  *
  * Ordering: score descending, then id ascending (deterministic
  * tiebreak). Emits array<struct<score double, id bigint>> sorted in
  * rank order.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  // java.lang.Double.compare gives a TOTAL order (NaN > +Inf, -0 < 0):
  // with </==, a NaN score would never compare better-or-equal, park at
  // the buffer tail while under k, and block every later eviction
  @inline private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(
      buf: ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.length < k || better(e, buf.last)) {
      var i = buf.length
      buf += e // placeholder slot
      while (i > 0 && better(e, buf(i - 1))) { buf(i) = buf(i - 1); i -= 1 }
      buf(i) = e
      if (buf.length > k) buf.remove(buf.length - 1)
    }
  }

  override def update(
      buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // + 0.0 normalizes -0.0 to +0.0: the total-order comparator ranks
      // +0.0 strictly above -0.0, but SQL ORDER BY (the oracle's
      // ROW_NUMBER) treats them equal and tie-breaks by id — a group
      // holding both signs of zero inside the top-k boundary would
      // otherwise rank differently on the two engines
      val sv = s.asInstanceOf[Double] + 0.0
      // NaN scores are unrankable — drop them here so the total-order
      // comparator (NaN > +Inf) never promotes them into top-k slots;
      // the comparator itself stays total for buffer maintenance
      if (!java.lang.Double.isNaN(sv)) insert(buf, (sv, i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      b1: ArrayBuffer[(Double, Long)],
      b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble(), bb.getLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg = copy(score = c(0), id = c(1))
}

object TopK {
  /** topk_by(score, id, k): bounded per-group top-k, rank order. */
  def topkBy(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKAgg(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())

  /** The ONE rank-unpack every ANN path shares: per-`key` bounded
    * top-k of (`score`, `id`), exploded to (key, rank, idName,
    * scoreName) with rank 1-based and the score rounded to 4dp —
    * ordering is score desc, id asc; NaN scores are dropped by
    * TopKAgg (callers' oracles pin that with NOT isnan). Changing the
    * rank contract here changes knn_brute, knn_ivf, ann_lsh, and
    * knn_pq's exact re-rank together instead of silently diverging
    * (PlanSpec asserts the whole family is Window-free). */
  def ranked(df: org.apache.spark.sql.DataFrame, key: String,
      score: Column, id: Column, k: Int,
      idName: String, scoreName: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(col(key))
      .agg(topkBy(score, id, k).as("top"))
      .select(col(key), posexplode(col("top")))
      .select(col(key), (col("pos") + 1).as("rank"),
        col("col")("id").as(idName),
        round(col("col")("score"), 4).as(scoreName))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(key)` against a pre-built Bloom filter — the
  * semi-join-reduction primitive: build the filter on the SMALL
  * (already-filtered) side with `df.stat.bloomFilter` (a mergeable
  * treeAggregate; the driver holds only the final bitmap), then prune
  * the BIG side row-by-row BEFORE it reaches the join shuffle. False
  * positives pass and are removed by the exact join that follows, so
  * the result is identical to the plain join; at 100 TB the win is
  * the shuffle volume a ~1% fpp filter removes.
  *
  * The filter travels as its serialized bytes (a plain case-class
  * field, so the expression tree stays serializable/canonicalizable)
  * and is deserialized once per task; codegen emits a direct
  * `mightContainLong` call inside WholeStageCodegen. */
case class BloomMightContainLong(child: Expression, bloomBits: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBits))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomExprs {
  /** Serialize a built filter for shipping inside the expression. */
  def bits(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** key-column test against the filter, whole-stage-codegen'd. */
  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    GraftBridge.column(
      BloomMightContainLong(GraftBridge.expression(key), bits(bloom)))
}

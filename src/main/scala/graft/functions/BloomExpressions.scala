package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Count of array elements that hit a serialized Bloom sketch — the fused
  * membership kernel for [[graft.ops.Curation.bloomDecontaminate]]. The
  * composable form, `size(filter(arr, h => might_contain(bloom, h)))`, is a
  * higher-order function: Spark HOFs never participate in whole-stage
  * codegen, so the entire scan projection around them drops to interpreted
  * eval. This expression keeps the probe loop inside the generated code
  * (the codegen calls back into the instance, whose deserialized sketch is
  * a transient lazy rebuilt once per executor).
  */
case class BloomHitCount(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hit_count"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  /** Public for generated code. */
  def hitCount(arr: ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bloom.mightContainLong(arr.getLong(i))) c += 1L
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    hitCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomHit", this, classOf[BloomHitCount].getName)
    defineCodeGen(ctx, ev, c => s"$self.hitCount($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHitCount =
    copy(child = newChild)

}

object BloomFunctions {
  /** (array<long> hashes, serialized sketch) → hit count. */
  def bloom_hit_count(hashes: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomHitCount(ColumnBridge.expression(hashes), bloomBytes))
}

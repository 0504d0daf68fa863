package graft.functions

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Random-hyperplane signatures for cosine LSH, fused: ONE loop computes
  * every plane's sign bit per row. The composed formulation (one
  * `aggregate(zip_with(...))` Column per plane) allocates an intermediate
  * array per plane per row and re-walks the vector once per plane — at 128
  * planes that is 128 array allocations/row; this is zero.
  *
  * Planes are generated driver-side from a seed (deterministic) and ride
  * into the generated code as a single flat `float[]` reference object.
  */
object HyperplaneOps {

  /** Deterministic N(0,1) planes, flat row-major [plane][dim]. Sign-only use
    * means scaling is irrelevant.
    */
  def flatPlanes(dim: Int, nPlanes: Int, seed: Long): Array[Float] = {
    val rnd = new Random(seed)
    Array.fill(nPlanes * dim)(rnd.nextGaussian().toFloat)
  }

  /** Sign bits of `vec` against `nPlanes` hyperplanes, packed into a long
    * (bit p = 1 iff dot(vec, plane_p) >= 0). nPlanes <= 64.
    */
  def bits(vec: ArrayData, planes: Array[Float], nPlanes: Int): Long = {
    val dim = planes.length / nPlanes
    val n = math.min(vec.numElements(), dim)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += vec.getFloat(i).toDouble * planes(off + i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Banded bucket keys: `bands` longs, key b = (b << planesPerBand) | the
    * b-th band's sign bits — the minhash-banding construction applied to
    * hyperplane LSH. Two vectors collide on band b iff all of that band's
    * bits agree; P(all-bands-miss) = (1 - p^r)^bands for per-plane agreement
    * p = 1 - θ/π, which is what makes high-recall cosine blocking possible
    * without giant single-band buckets.
    */
  def bandKeys(vec: ArrayData, planes: Array[Float], bands: Int,
      planesPerBand: Int): ArrayData = {
    val dim = planes.length / (bands * planesPerBand)
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bitsB = 0L
      var j = 0
      while (j < planesPerBand) {
        val off = (b * planesPerBand + j) * dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += vec.getFloat(i).toDouble * planes(off + i)
          i += 1
        }
        if (dot >= 0) bitsB |= (1L << j)
        j += 1
      }
      out(b) = (b.toLong << planesPerBand) | bitsB
      b += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Packed sign-bit signature (long) of an array<float> vector column. */
case class HyperplaneBits(child: Expression, planes: Array[Float], nPlanes: Int)
  extends UnaryExpression {
  require(nPlanes <= 64, "at most 64 planes fit a packed long signature")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override def nullSafeEval(input: Any): Any =
    HyperplaneOps.bits(input.asInstanceOf[ArrayData], planes, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneOps.bits($c, $ref, $nPlanes)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)

}

/** Banded LSH bucket keys (array<long>) of an array<float> vector column. */
case class HyperplaneBandKeys(child: Expression, planes: Array[Float],
    bands: Int, planesPerBand: Int) extends UnaryExpression {
  require(planesPerBand <= 56, "band id must fit above the band's bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_keys"

  override def nullSafeEval(input: Any): Any =
    HyperplaneOps.bandKeys(input.asInstanceOf[ArrayData], planes, bands, planesPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "float[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneOps.bandKeys($c, $ref, $bands, $planesPerBand)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandKeys =
    copy(child = newChild)

}

object HyperplaneFunctions {
  /** Packed hyperplane sign bits of an array<float> column. */
  def hyperplane_bits(vec: Column, planes: Array[Float], nPlanes: Int): Column =
    ColumnBridge.column(HyperplaneBits(ColumnBridge.expression(vec), planes, nPlanes))

  /** Banded hyperplane LSH bucket keys of an array<float> column. */
  def hyperplane_band_keys(vec: Column, planes: Array[Float], bands: Int,
      planesPerBand: Int): Column =
    ColumnBridge.column(
      HyperplaneBandKeys(ColumnBridge.expression(vec), planes, bands, planesPerBand))
}

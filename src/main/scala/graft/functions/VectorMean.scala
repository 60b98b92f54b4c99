package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of array<double> vectors as a mergeable
  * TypedImperativeAggregate: state is ONE (count, dim-length sums)
  * buffer per group — O(dim) — updated in place per row and merged by
  * element-wise addition.
  *
  * The mean is EXACT under any accumulation order: each component
  * quantizes to an integer at 10^scale (floor(x·q + 0.5) — the same
  * IEEE ops as the oracle's `CAST(floor(x * q + 0.5) AS BIGINT)`),
  * sums accumulate in Long (associative, order-free), and eval
  * rounds sum/count half-up IN INTEGER ARITHMETIC before the one
  * exact double division by 10^scale. The r11 sf1 gate showed why
  * the sums must be integers: double-sum partials reordered across
  * engines (and across Spark runs) flip a 6 dp digit once clusters
  * reach sf1 size, and one flipped centroid component cascades
  * through every later Lloyd round. The r12 residual showed why the
  * ROUNDING must be integer too: rounding the double quotient
  * (BigDecimal here, multiply-round in DuckDB) still disagrees by
  * one final digit when the exact quotient sits within float noise
  * of a .5·10⁻ˢ boundary. Quantizing at 1e-6 — below the 6 dp output
  * grid — changes no honest digit, only removes the noise. Overflow
  * headroom: |2·sum| < 2^63 needs count · max|x| < 4.6e12 at scale 6
  * — a 10⁹-member cluster of unit-scale components sits 3+ orders
  * below it. */
case class VectorMean(
    child: Expression,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMean.Buffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private val quant: Double = math.pow(10.0, scale)

  override def createAggregationBuffer(): VectorMean.Buffer =
    new VectorMean.Buffer(0L, null)

  override def update(b: VectorMean.Buffer, input: InternalRow): VectorMean.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Long](n)
      // dimension-safety: a ragged input would otherwise AIOOBE (longer
      // row) or silently average a prefix (shorter row)
      require(n == b.sums.length,
        s"VectorMean: input dimension $n != first-seen ${b.sums.length}")
      var i = 0
      while (i < n) {
        b.sums(i) += math.floor(arr.getDouble(i) * quant + 0.5).toLong
        i += 1
      }
      b.count += 1
    }
    b
  }

  override def merge(b: VectorMean.Buffer, o: VectorMean.Buffer): VectorMean.Buffer = {
    if (o.sums != null) {
      if (b.sums == null) b.sums = new Array[Long](o.sums.length)
      // partials that saw different dims must fail loudly, not drop a tail
      require(o.sums.length == b.sums.length,
        s"VectorMean: merge dimension ${o.sums.length} != ${b.sums.length}")
      var i = 0
      while (i < b.sums.length) { b.sums(i) += o.sums(i); i += 1 }
      b.count += o.count
    }
    b
  }

  override def eval(b: VectorMean.Buffer): Any = {
    if (b.sums == null || b.count == 0L) return null
    val out = new Array[Double](b.sums.length)
    var i = 0
    while (i < out.length) {
      // half-up rounding of sum/count IN INTEGER ARITHMETIC: the
      // rounded-double route (BigDecimal here, multiply-round in
      // DuckDB) disagrees by one final digit when the exact quotient
      // sits within float noise of a .5·10⁻ˢ boundary — the r12 sf1
      // residual (one centroid component of 4096 flipped). m =
      // ⌊(2|s| + n) / 2n⌋ with the sign restored is HALF_UP (ties
      // away from zero) exactly; the single division m/10^scale is
      // then the same correctly-rounded double in both engines.
      val s = b.sums(i)
      val m =
        if (s >= 0) (2 * s + b.count) / (2 * b.count)
        else -((2 * -s + b.count) / (2 * b.count))
      out(i) = m.toDouble / quant
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: VectorMean.Buffer): Array[Byte] = {
    val n = if (b.sums == null) 0 else b.sums.length
    val bb = java.nio.ByteBuffer.allocate(12 + 8 * n)
    bb.putLong(b.count)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMean.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val n = bb.getInt
    if (n == 0) new VectorMean.Buffer(count, null)
    else {
      val sums = new Array[Long](n)
      var i = 0
      while (i < n) { sums(i) = bb.getLong; i += 1 }
      new VectorMean.Buffer(count, sums)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMean =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMean =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): VectorMean = copy(child = cs.head)
  override def prettyName: String = "vector_mean"
}

object VectorMean {
  final class Buffer(var count: Long, var sums: Array[Long])
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def vector_mean(c: Column, scale: Int): Column =
    column(VectorMean(expression(c), scale).toAggregateExpression())
}

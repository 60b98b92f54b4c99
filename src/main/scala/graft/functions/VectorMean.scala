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
  * element-wise addition. Components are rounded to `scale` dp with
  * the same shortest-repr HALF_UP rule as Spark's round() so results
  * interoperate with oracle replays.
  *
  * Replaces the posexplode → groupBy(cid, pos) → avg →
  * collect_list reassembly in the IVF Lloyd round: same partial-agg
  * shuffle volume (K×dim per partition either way), but one
  * aggregation instead of two and no n×dim row materialization
  * through the hash map — the per-row cost is a compiled dim-length
  * loop. Accumulation order across partitions is nondeterministic in
  * BOTH formulations (avg has the same property); the 6 dp rounding
  * absorbs it, as the cross-core correctness runs assert. */
case class VectorMean(
    child: Expression,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMean.Buffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VectorMean.Buffer =
    new VectorMean.Buffer(0L, null)

  override def update(b: VectorMean.Buffer, input: InternalRow): VectorMean.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Double](n)
      // dimension-safety: a ragged input would otherwise AIOOBE (longer
      // row) or silently average a prefix (shorter row)
      require(n == b.sums.length,
        s"VectorMean: input dimension $n != first-seen ${b.sums.length}")
      var i = 0
      while (i < n) { b.sums(i) += arr.getDouble(i); i += 1 }
      b.count += 1
    }
    b
  }

  override def merge(b: VectorMean.Buffer, o: VectorMean.Buffer): VectorMean.Buffer = {
    if (o.sums != null) {
      if (b.sums == null) b.sums = new Array[Double](o.sums.length)
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
      // same rule as Spark round(): shortest-repr BigDecimal, HALF_UP
      out(i) = java.math.BigDecimal.valueOf(b.sums(i) / b.count)
        .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
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
    while (i < n) { bb.putDouble(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMean.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val n = bb.getInt
    if (n == 0) new VectorMean.Buffer(count, null)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = bb.getDouble; i += 1 }
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
  final class Buffer(var count: Long, var sums: Array[Double])
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def vector_mean(c: Column, scale: Int): Column =
    column(VectorMean(expression(c), scale).toAggregateExpression())
}

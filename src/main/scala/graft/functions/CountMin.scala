package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) as a mergeable
  * TypedImperativeAggregate — the frequency-estimate member of the
  * sketch family (KMV distincts §2.46, SpaceSaving top-k §2.128,
  * Bloom membership §2.118, KLL quantiles §2.156, HLL §2.160):
  * point-queryable approximate counts for EVERY key in constant state,
  * where SpaceSaving keeps only the top `capacity` candidates.
  *
  * Layout: [[D]]=4 counter rows × [[W]]=1024 columns (32 KB of longs).
  * The input is the repo's 60-bit md5-prefix hash
  * ([[graft.text.TextFunctions.hash64]]); row i's column is bits
  * [10·i, 10·i+10) — four disjoint 10-bit windows of one uniform
  * 60-bit hash, so no second hash family is needed and the DuckDB
  * oracle replays columns with `(h >> (10·i)) & 1023`. Estimates
  * (min over the D row counters) are ALWAYS ≥ the true count — the
  * one-sided CM guarantee; overshoot ≤ e·N/W with prob 1−e^−D per
  * query. Everything is integer arithmetic: counters sum exactly in
  * any merge order, so Spark partial aggregation and the oracle's
  * group-by replay are bit-identical.
  *
  * eval returns the raw counter array (not a scalar): probing is a
  * query-side concern — `element_at` + `least` over the D cells —
  * which keeps the aggregate reusable (heavy-hitter gating, join-size
  * estimation, per-key rate limiting) and the probe codegen'd. */
case class CountMin(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CountMin._

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < D) {
        b(i * W + ((h >>> (BitsPerRow * i)) & (W - 1)).toInt) += 1L
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMin =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMin =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CountMin = copy(child = cs.head)
  override def prettyName: String = "count_min"
}

object CountMin {
  /** Counter rows (independent hash windows). */
  val D = 4
  /** Columns per row; power of two so the column mask is `& (W-1)`. */
  val W = 1024
  /** Bits consumed from the 60-bit hash per row window. */
  val BitsPerRow = 10

  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
  def count_min(c: Column): Column =
    column(CountMin(expression(c)).toAggregateExpression())
}
